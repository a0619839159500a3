package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, attach the latest right row
  * with the same key whose time is <= the left row's time.
  *
  * Spark has no native as-of join; a naive formulation is a range
  * theta-join (quadratic per key). This implementation is the
  * single-shuffle union trick instead:
  *
  *   1. tag left rows 1, right rows 0, union them;
  *   2. one window partitioned by key, ordered by (time, tag) —
  *      `last(payload, ignoreNulls)` over unbounded-preceding..current
  *      carries the most recent right payload forward (at equal times the
  *      right row sorts first, so ties match, like `ON l.t >= r.t`);
  *   3. keep only the left rows.
  *
  * Cost: ONE shuffle on the key column — the same cost as any keyed
  * aggregation, no join blowup, no range comparison per pair. Skewed keys
  * behave like any windowed aggregation (salt-able if a key dominates).
  *
  * (Extension surface — the reference engine has only an inner equi-join,
  * reference: src/physical_plan/nested_loop_join.rs:62-191.)
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      rows providing the carried payload
    * @param keyCol     equi-key present in both sides
    * @param timeCol    monotonic order column present in both sides
    * @param payloadCols right-side columns to carry (become `asof_<name>`)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_tag", "_r", "_asof") ++ payloadCols.map("asof_" + _)
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with reserved as-of names: " +
        leftCols.filter(reserved.contains).mkString(", "))
    // the whole right payload travels as ONE struct: last(_, ignoreNulls)
    // then selects the latest right ROW atomically — per-column carrying
    // would resurrect an older value when the latest right row holds a
    // null, and could even stitch fields from different right rows
    val payloadStruct = struct(payloadCols.map(c => col(c).as(c)): _*)
    val structType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    val lAligned = left.withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(structType))
    val rAligned = leftCols.foldLeft(
      right.select((keyCol +: timeCol +: payloadCols).distinct.map(col): _*)
        // a NULL key or time can never legitimately match under SQL
        // `l.k = r.k AND l.t >= r.t` semantics — but asc-nulls-first
        // ordering would sort such rows before everything and leak their
        // payload into every left row, so drop them up front
        .where(col(keyCol).isNotNull && col(timeCol).isNotNull)
        .withColumn("_tag", lit(0))
        .withColumn("_r", payloadStruct))((df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lAligned.columns.map(col): _*)

    // final `_r` tiebreaker: several right rows at the same (key, time)
    // would otherwise resolve by physical row order — nondeterministic
    // across retries; struct ordering makes last() pick the max payload
    val w = Window.partitionBy(keyCol)
      .orderBy(col(timeCol), col("_tag"), col("_r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(c => col(s"_asof.$c").as(s"asof_$c"))): _*)
  }
}
