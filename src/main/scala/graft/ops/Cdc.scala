package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level change-data-capture application: fold a change log into a
  * base snapshot (MERGE semantics — insert/update/delete by key), and
  * build SCD-type-2 validity history from the same log. The lakehouse
  * maintenance pair for any slowly-updated table a pipeline joins
  * against (user profiles, document registries, label corrections).
  *
  * (Extension surface — the reference engine is read-only over static
  * files; this pairs with ops/Layout.upsertPartitions, which lands
  * whole partitions, by doing the ROW-level half of the problem.)
  *
  * Determinism contract: `seqCols` must be a TOTAL order within a key
  * (e.g. (ts, unique_change_id)) — with ties left possible, "latest"
  * would be partitioning-dependent. Nothing here does floating-point
  * arithmetic; payload columns pass through untouched, so results are
  * bit-identical on any engine.
  *
  * Scale shape (applyChanges): the change log shuffles ONCE on the key
  * for the latest-wins window; the base is touched by one key-keyed
  * LEFT ANTI join against the (already key-distinct) changed-key set —
  * at 100 TB the base never re-sorts and never moves payload for
  * unchanged keys, and when a day's changes are dim-sized AQE turns the
  * anti join into a broadcast. Output row count = base - deleted +
  * upserted. */
object Cdc {

  /** MERGE a change log into a base snapshot. The latest change per key
    * (by `seqCols`, descending) wins: op 'I'/'U' upserts the payload,
    * 'D' removes the key. Change rows must carry every base column
    * (payload) plus `opCol` and `seqCols`; output schema = base schema.
    */
  def applyChanges(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty,
      "applyChanges needs key and sequence columns")
    require(!base.columns.contains("__rn"),
      "base must not contain a __rn column")
    val latest = latestPerKey(changes, keyCols, seqCols)
    val upserts = latest.where(col(opCol) =!= "D")
      .select(base.columns.map(col).toIndexedSeq: _*)
    base.join(latest.select(keyCols.map(col).toIndexedSeq: _*),
        keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** SCD-type-2 validity history from a change log: one interval per
    * surviving change row, `valid_from` = its own `seqCol`, `valid_to` =
    * the key's next change (NULL while open), `is_current` marking the
    * open interval. A 'D' row closes its predecessor's interval without
    * opening one (the key has no current row after a delete).
    *
    * One shuffle: the per-key window orders by (`seqCol`, `tieCols`).
    * `valid_to` is exclusive — the next change's sequence value. */
  def scd2(changes: DataFrame, keyCols: Seq[String], seqCol: String,
      tieCols: Seq[String] = Nil, opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs key columns")
    val order = (seqCol +: tieCols).map(col)
    val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(order.toIndexedSeq: _*)
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .where(col(opCol) =!= "D")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Latest change row per key by `seqCols` descending (row 1 of the
    * per-key window). */
  def latestPerKey(changes: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(seqCols.map(col(_).desc).toIndexedSeq: _*)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }
}
