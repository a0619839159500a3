package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salting for hot keys.
  *
  * A single dominant group/join key funnels its entire partition through
  * one task at shuffle time — the classic 100 TB failure mode. Salting
  * spreads a hot key across `saltBuckets` sub-keys:
  *
  *  - [[saltedAggregate]]: two-phase aggregation — partial aggregate on
  *    (key, salt), final aggregate on key. Exact for the algebraic
  *    aggregates provided (sum/count/min/max); results are identical to a
  *    plain groupBy regardless of how rows land in salt buckets.
  *  - [[saltedJoin]]: the big (skewed) side gets a deterministic salt; the
  *    small side is replicated across all salt values (explode of a
  *    saltBuckets-element array), and the join runs on (key, salt). Row
  *    multiplicity is unchanged — each big-side row still matches each
  *    small-side row exactly once.
  *
  * Spark's AQE skew-join handles many cases automatically at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on in [[graft.GraftSession]]);
  * explicit salting remains the tool when AQE can't help — aggregations,
  * or joins whose skew AQE's split heuristics miss.
  */
object Skew {

  /** Deterministic row-spreading salt (content-hashed, stable across
    * retries; which bucket a row lands in does not affect results).
    *
    * KNOWN LIMITATION: FULLY identical rows (same key AND same payload)
    * hash to the same bucket, so a hot key whose rows are byte-identical
    * stays unsplit. A row-position disambiguator
    * (monotonically_increasing_id) would spread them but is NOT stable
    * across task retries — a recomputed map task would re-salt rows into
    * different buckets than the copies already fetched by reducers,
    * silently double-counting or losing rows (Spark only rolls back
    * whole stages for operators it marks order-indeterminate, not for
    * nondeterministic column expressions). Exactness wins: if your hot
    * key's rows are identical, aggregate them (they collapse to one
    * partial row per bucket anyway) or add a real disambiguating column
    * upstream. */
  private def saltOf(cols: Seq[Column], buckets: Int): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Exact sum/count per key via two-phase salted aggregation. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt",
      saltOf(df.columns.map(col).toSeq, saltBuckets))
    salted.groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"),
        min(col(valueCol)).as("_pmin"), max(col(valueCol)).as("_pmax"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"),
        min(col("_pmin")).as(s"min_$valueCol"),
        max(col("_pmax")).as(s"max_$valueCol"))
  }

  /** Equi-join where `big`'s `keyCol` is skewed: salt big, replicate
    * `small` across all salt values, join on (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, saltBuckets: Int = 32): DataFrame = {
    // the sibling-op reserved-name convention (RangeJoin's _bin,
    // AsOfJoin's list): a user _salt column would be silently
    // overwritten and then dropped from the output
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt; rename it upstream")
    val b = big.withColumn("_salt",
      saltOf(big.columns.map(col).toSeq, saltBuckets))
    val s = small.withColumn("_salt",
      explode(typedLit((0 until saltBuckets).toArray)))
    b.join(s, b(bigKey) === s(smallKey) && b("_salt") === s("_salt"))
      .drop("_salt")
  }
}
