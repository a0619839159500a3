package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    val upserts = latest.where(checkedOp(opCol, "applyChanges") =!= "D")
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
      .where(checkedOp(opCol, "scd2") =!= "D")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Op-code guard shared by every change consumer: a NULL or unknown
    * op (a corrupt/partial CDC extract) was previously treated as a
    * silent DELETE — the row's key anti-joined the base away while the
    * row itself failed `=!= "D"` and never re-entered. Fail loudly
    * instead. */
  private def checkedOp(opCol: String, fn: String): Column =
    when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"$fn: unknown change op '"),
        coalesce(col(opCol).cast("string"), lit("null")),
        lit("' — expected I/U/D"))))

  /** Latest change row per key by `seqCols` descending (row 1 of the
    * per-key window). */
  def latestPerKey(changes: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(seqCols.map(col(_).desc).toIndexedSeq: _*)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Point-in-time (temporal) join: attach to each fact row the dim
    * version whose `[validFromCol, validToCol)` interval contains the
    * fact's `timeCol` — the lookup every event pipeline does against an
    * SCD2 dimension ("which profile was current when this click
    * happened"). An open interval (`validToCol` IS NULL) matches
    * everything from its `validFromCol` on.
    *
    * Facts before a key's first version, or on keys the dim has never
    * seen, keep their row with NULL dim columns (LEFT join — dropping
    * facts because a dimension is late is how pipelines silently lose
    * data). Intervals per key are assumed disjoint (what `scd2`
    * produces), so at most one version matches and the output has
    * exactly one row per fact.
    *
    * Scale shape: this is an EQUI join on the key with the interval
    * containment as a residual filter — one key-keyed shuffle of each
    * side (or none for the facts when the dim broadcasts; dims are
    * usually dim-sized). Never a range/theta join: the interval math
    * rides the hash join's residual, so 100 TB of facts meet only their
    * own key's handful of versions, not a time-axis product. */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCols: Seq[String],
      timeCol: String, validFromCol: String = "valid_from",
      validToCol: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty, "pointInTime needs key columns")
    // the dim side is renamed wholesale before the join: facts and dim
    // routinely share lineage (an SCD2 dim built from the same event
    // stream as the facts), and qualified df(col) refs on a self-join
    // of derived frames is exactly where Spark's ambiguous-self-join
    // analysis bites
    // a dim payload/validity name already present on the facts side
    // would silently produce DUPLICATE output columns after the
    // rename-back (an AMBIGUOUS_REFERENCE far from its cause) — reject
    val clash = facts.columns.toSet
      .intersect(dim.columns.filterNot(keyCols.contains).toSet)
    require(clash.isEmpty,
      s"pointInTime: facts already carry dim column(s) " +
        s"${clash.mkString(", ")} — rename them before joining")
    val pfx = "__dim_"
    val dimR = dim.columns.foldLeft(dim)((d, c) => d.withColumnRenamed(c, pfx + c))
    val cond = keyCols.map(k => col(k) === col(pfx + k)).reduce(_ && _) &&
      col(timeCol) >= col(pfx + validFromCol) &&
      (col(pfx + validToCol).isNull || col(timeCol) < col(pfx + validToCol))
    val restored = dim.columns.filterNot(keyCols.contains)
    restored.foldLeft(facts.join(dimR, cond, "left")) {
      (d, c) => d.withColumnRenamed(pfx + c, c)
    }.drop(keyCols.map(pfx + _).toIndexedSeq: _*)
  }

  /** Row-level diff of two snapshots of the same table: one row per key
    * present in either side, classified `added` / `removed` / `changed`
    * / `unchanged` — the audit primitive behind "what did yesterday's
    * load actually do" and the input to incremental downstream refresh.
    *
    * Payload equality is per-column null-safe (`<=>`): a NULL payload
    * equals NULL and differs from any value. Both sides must share the
    * key columns and the compared payload columns (`payloadCols`
    * defaults to every shared non-key column). Keys are assumed unique
    * per side (snapshots, not logs).
    *
    * Scale shape: one FULL OUTER hash join keyed on the key columns —
    * each side shuffles once; with both snapshots bucket-written on the
    * key (Catalog.addBucketedTable) the exchanges vanish entirely. The
    * payload travels only to its own key's reducer, never broadcast,
    * never driver-side. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], payloadCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs key columns")
    val payload =
      if (payloadCols.nonEmpty) payloadCols
      else oldDf.columns.filterNot(keyCols.contains)
        .filter(newDf.columns.contains).toSeq
    require(payload.nonEmpty, "snapshotDiff needs payload columns")
    // both sides renamed before the join (see pointInTime): the new
    // snapshot is usually DERIVED from the old one, the self-join case
    // qualified refs can't survive
    val cols = (keyCols ++ payload).distinct
    // presence markers, not key nullness: a row whose KEY VALUE is
    // legitimately NULL is present on its side, and testing the key
    // column misclassified it (a removed NULL-key row read as "added");
    // the null-safe key join also lets NULL-key rows pair up instead of
    // always splitting into an added+removed pair (r11 self-review)
    def side(df: DataFrame, pfx: String) =
      cols.foldLeft(df.select(cols.map(col).toIndexedSeq: _*)) {
        (d, c) => d.withColumnRenamed(c, pfx + c)
      }.withColumn(pfx + "present", lit(1))
    val o = side(oldDf, "__o_")
    val n = side(newDf, "__n_")
    val cond = keyCols.map(k => col("__o_" + k) <=> col("__n_" + k))
      .reduce(_ && _)
    val same = payload.map(c => col("__o_" + c) <=> col("__n_" + c))
      .reduce(_ && _)
    val status = when(col("__o_present").isNull, "added")
      .when(col("__n_present").isNull, "removed")
      .when(same, "unchanged")
      .otherwise("changed")
    val keys = keyCols.map(k =>
      coalesce(col("__n_" + k), col("__o_" + k)).as(k))
    o.join(n, cond, "full_outer")
      .select(keys :+ status.as("status"): _*)
  }

  /** Incremental view maintenance for a grouped COUNT + SUM: fold a
    * change log into a MATERIALIZED aggregate without recomputing it
    * from the base table. Given the base snapshot, its pre-computed
    * per-`groupCol` aggregate (`baseAgg` with columns `groupCol`, `n`,
    * `total`), and a change log, returns the aggregate of
    * `applyChanges(base, changes)` — touching the base only to look up
    * the OLD rows of changed keys.
    *
    * Exactness contract: per-row values are cast to DECIMAL(18,6)
    * before any sum, so removal is exact subtraction and the maintained
    * total is bit-identical to a full recompute on any engine — the
    * reason a double sum can't be maintained incrementally is exactly
    * the rounding this cast removes. Groups whose count reaches zero
    * disappear (as a recompute would drop them); a group changed rows
    * move INTO appears even if absent from `baseAgg`.
    *
    * Scale shape: the log shuffles once for latest-wins; the base is
    * touched by ONE key-keyed semi-style inner join against the
    * (day-sized, AQE-broadcastable) changed-key set to extract old
    * contributions — at 100 TB the win is exactly that the full base
    * never re-aggregates. Delta and merge aggregates are
    * changed-key-sized. Output: (`groupCol`, `n` BIGINT, `total`
    * DECIMAL(18,6)). */
  def incrementalAgg(base: DataFrame, baseAgg: DataFrame,
      changes: DataFrame, keyCols: Seq[String], groupCol: String,
      valueCol: String, seqCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty,
      "incrementalAgg needs key and sequence columns")
    val dec = (c: Column) => c.cast("decimal(18,6)")
    val latest = latestPerKey(changes, keyCols, seqCols)
    val changedKeys = latest.select(keyCols.map(col).toIndexedSeq: _*)
    // old contributions of changed keys leave their groups...
    val removed = base.join(changedKeys, keyCols)
      .select(col(groupCol), lit(-1L).as("dn"),
        (dec(col(valueCol)) * -1).as("dtotal"))
    // ...and surviving latest rows enter theirs
    val arrived = latest.where(checkedOp(opCol, "incrementalAgg") =!= "D")
      .select(col(groupCol), lit(1L).as("dn"), dec(col(valueCol)).as("dtotal"))
    val delta = removed.unionByName(arrived)
      .groupBy(col(groupCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dtotal")).as("dtotal"))
      .withColumnRenamed(groupCol, "__dg")
    // null-safe merge: a NULL group is a legal grouping value a full
    // recompute emits as ONE row — a plain full_outer split it into a
    // stale row plus an orphan delta (r11 self-review)
    baseAgg.join(delta, col(groupCol) <=> col("__dg"), "full_outer")
      .select(coalesce(col(groupCol), col("__dg")).as(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        dec(coalesce(dec(col("total")), dec(lit(0)))
          + coalesce(col("dtotal"), dec(lit(0)))).as("total"))
      .where(col("n") > 0)
  }

  /** Incremental maintenance for NON-invertible aggregates (MIN/MAX —
    * a delete can't be subtracted from a min), by the other classic
    * IVM strategy: recompute ONLY the affected groups. A group is
    * affected when any changed key's old row lived in it or any
    * surviving change lands in it; affected groups re-aggregate from
    * the merged snapshot restricted to those groups, every other group
    * passes through from `baseAgg` untouched.
    *
    * `baseAgg` must carry (`groupCol`, `n`, `lo`, `hi`) = grouped
    * (count, min, max) of `valueCol` over the base. Output has the
    * same shape for the merged state. No arithmetic beyond count —
    * min/max of stored values are engine-portable by construction.
    *
    * Scale shape: the log shuffles once for latest-wins; the base is
    * touched by one key join (old-group lookup) and one semi join on
    * the (day-sized, broadcastable) affected-group set — at 100 TB
    * the recompute reads only the affected groups' rows, and the
    * untouched majority of `baseAgg` never moves at all. */
  def incrementalMinMax(base: DataFrame, baseAgg: DataFrame,
      changes: DataFrame, keyCols: Seq[String], groupCol: String,
      valueCol: String, seqCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty && seqCols.nonEmpty,
      "incrementalMinMax needs key and sequence columns")
    val latest = latestPerKey(changes, keyCols, seqCols)
    val changedKeys = latest.select(keyCols.map(col).toIndexedSeq: _*)
    val upserts = latest.where(checkedOp(opCol, "incrementalMinMax") =!= "D")
    val affected = base.join(changedKeys, keyCols)
      .select(col(groupCol))
      .unionByName(upserts.select(col(groupCol)))
      .distinct()
      .withColumnRenamed(groupCol, "__ag")
    val baseCols: Seq[String] = (keyCols ++ Seq(groupCol, valueCol)).distinct
    val logCols: Seq[String] = (baseCols ++ Seq(opCol) ++ seqCols).distinct
    val merged = applyChanges(
      base.select(baseCols.map(col).toIndexedSeq: _*),
      latest.select(logCols.map(col).toIndexedSeq: _*),
      keyCols, seqCols, opCol)
    // null-safe membership (<=>): a NULL group's recompute was dropped
    // by the semi join while its stale aggregate survived the anti join
    val recomputed = merged.join(affected,
        col(groupCol) <=> col("__ag"), "left_semi")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), min(col(valueCol)).as("lo"),
        max(col(valueCol)).as("hi"))
    baseAgg.join(affected, col(groupCol) <=> col("__ag"), "left_anti")
      .unionByName(recomputed)
  }
}
