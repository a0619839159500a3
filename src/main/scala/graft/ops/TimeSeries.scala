package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: put per-key event streams onto a
  * fixed-step bucket grid and forward-fill the gaps — the resample +
  * ffill step every feature pipeline runs before windowed model inputs.
  *
  * (Extension surface — the reference engine has no time functions at
  * all; this builds on the same event fixtures as the as-of / range
  * join family.)
  */
object TimeSeries {

  /** Per-key fixed-step grid from each key's first to last bucket, with
    * the supplied per-bucket aggregates, and the `fillCols` columns
    * forward-filled: a row (gap row OR data-point row whose aggregate
    * is NULL, e.g. sum over all-NULL values) carries the latest earlier
    * non-NULL value — standard ffill semantics; non-NULL aggregates at
    * data points always keep their own value.
    *
    * `bucket` must be an integral column expression over `df`'s rows
    * (e.g. `expr("ts_sec div 3600")` for hourly buckets) — the grid
    * steps by 1 in bucket units, so the caller controls resolution.
    *
    * Scale shape: one partial+final aggregation shuffles (key, bucket);
    * the grid is a per-key `sequence` explode bounded by that key's own
    * span (never a global cartesian with the time axis); the gap join
    * is keyed on (key, bucket); the forward fill is one window per key
    * ordered by bucket. A key whose span is pathologically long
    * concentrates its grid in one window partition — the same watch
    * item as the as-of join, and the same time-range salting applies
    * if it bites. */
  def resampleFfill(df: DataFrame, keyCol: String, bucket: Column,
      aggs: Seq[Column], fillCols: Seq[String]): DataFrame = {
    require(aggs.nonEmpty, "resampleFfill needs at least one aggregate")
    val perBucket = df.groupBy(col(keyCol), bucket.as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
    val grid = perBucket.groupBy(col(keyCol))
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
      .select(col(keyCol),
        explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val joined = grid.join(perBucket, Seq(keyCol, "bucket"), "left")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(joined)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }
}
