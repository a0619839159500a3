package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the data-quality summary every ingestion
  * run wants before anything downstream trusts the batch: per column,
  * row count, null count, distinct count, min and max (rendered as
  * strings for a uniform output schema).
  *
  * Scale shape: ONE aggregation pass over the input produces a single
  * wide row (5 scalars per profiled column), unpivoted driver-free via
  * explode — output size is #columns rows regardless of input size.
  * `exactDistinct = true` uses COUNT(DISTINCT), which Catalyst plans as
  * an Expand (one duplicated stream per distinct aggregate) — exact but
  * #cols× the shuffle volume; at 100 TB profile with the default
  * HyperLogLog `approx_count_distinct` (2% error) and reserve exact for
  * audits.
  *
  * (Extension surface — the reference engine has no statistics or
  * profiling of any kind.)
  */
object Profile {

  /** @param cols columns to profile (default: all)
    * @param exactDistinct exact COUNT(DISTINCT) instead of HyperLogLog */
  def summarize(df: DataFrame, cols: Seq[String] = Nil,
      exactDistinct: Boolean = false): DataFrame = {
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    require(names.nonEmpty, "profile requires at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: names.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = array(names.map { c =>
      struct(lit(c).as("col_name"), col("__rows").as("n_rows"),
        (col("__rows") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }: _*)
    one.select(explode(entries).as("p")).select("p.*")
  }
}
