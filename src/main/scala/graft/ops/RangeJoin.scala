package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join (the attribution-join shape: "every click
  * within one day after a purchase by the same user").
  *
  * The reference engine's only join is an equi nested-loop
  * (reference: src/physical_plan/nested_loop_join.rs:62-191); a range
  * predicate there means a full cross product per key. Spark's own planner
  * does better — key equality plus a range residual plans as a hash join on
  * the key — but that still degenerates per-key: a hot key with P points
  * and I intervals materializes P×I pairs in one task before the range
  * filter runs. That is exactly the skew that kills a 100 TB attribution
  * job.
  *
  * This operator shards the RANGE dimension instead: time is cut into
  * fixed-width bins, each interval is exploded onto every bin it overlaps,
  * and candidates come from an equi-join on (key, bin) — so a hot key's
  * work spreads across (hot key, bin) combinations and AQE's skew-split
  * sees ordinary equi-join partitions. A point lies in exactly one bin, so
  * every (point, interval) match joins exactly once — no post-join dedup.
  *
  * Cost model: the interval side is duplicated ceil(span/binWidth)+1 ≈ 2×
  * when binWidth is chosen near the typical interval length (the right
  * default); the point side is never duplicated. Both sides shuffle on
  * (key, bin) — ids and bounds only if callers project first, as with any
  * join. Times are epoch-scaled longs (micros in this repo's fixtures);
  * NEGATIVE times (pre-1970 data) are first-class — binning uses true
  * floor division `(t - pmod(t, w)) div w` rather than the
  * toward-zero `div`, which would fold bins [-w, 0) and [0, w) together
  * (review r12: the old guard silently FILTERED negative times instead,
  * making pre-epoch matches vanish with no error).
  */
object RangeJoin {

  /** True floor-division bin of a long expression: `div` truncates
    * toward zero, which would merge the bins either side of zero;
    * subtracting the (always non-negative) pmod first makes the
    * quotient exact floor for any sign. */
  private def floorBin(x: String, w: Long): org.apache.spark.sql.Column =
    expr(s"(($x) - pmod(($x), ${w}L)) div ${w}L")

  /** Inner join of `points` to every `intervals` row with equal key whose
    * half-open [start, end) window contains the point's time. Output =
    * points' columns ++ intervals' columns (names must be disjoint; project
    * before calling). Degenerate intervals (end <= start) and NULL
    * keys/bounds/times match nothing, mirroring SQL comparison semantics.
    */
  def pointInInterval(points: DataFrame, pKey: String, pTime: String,
      intervals: DataFrame, iKey: String, iStart: String, iEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInInterval requires disjoint column names; both sides have: " +
        overlap.mkString(", "))
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "pointInInterval reserves the column name _bin; rename it upstream")

    val p = points
      .where(col(pKey).isNotNull && col(pTime).isNotNull)
      .withColumn("_bin", floorBin(s"`$pTime`", binWidth))
    // one row per (interval, overlapped bin); end is exclusive so the last
    // overlapped bin is the one containing end-1
    val iv = intervals
      .where(col(iKey).isNotNull && col(iStart).isNotNull &&
        col(iEnd).isNotNull && col(iEnd) > col(iStart))
      .withColumn("_bin", explode(sequence(
        floorBin(s"`$iStart`", binWidth),
        floorBin(s"(`$iEnd` - 1L)", binWidth))))

    p.as("_rjp").join(iv.as("_rji"),
        col("_rjp._bin") === col("_rji._bin") &&
          col(s"_rjp.`$pKey`") === col(s"_rji.`$iKey`") &&
          col(s"_rjp.`$pTime`") >= col(s"_rji.`$iStart`") &&
          col(s"_rjp.`$pTime`") < col(s"_rji.`$iEnd`"))
      .select(points.columns.map(c => col(s"_rjp.`$c`")).toSeq ++
        intervals.columns.map(c => col(s"_rji.`$c`")): _*)
  }

  /** Inner join of two interval tables on equal key where the half-open
    * windows [aStart, aEnd) and [bStart, bEnd) overlap. Same bin-sharding
    * as [[pointInInterval]], with one extra rule because BOTH sides span
    * bins: a pair could meet in every bin both cover, so the join also
    * requires the bin to be the pair's OWNERSHIP bin — the bin containing
    * max(aStart, bStart), the later start. For an overlapping pair that
    * bin lies inside both intervals' bin spans (the later start is before
    * both ends), so every overlapping pair matches exactly once and
    * non-overlapping pairs never do — no post-join dedup, same equi-join
    * scale shape. Output = a's columns ++ b's columns (names disjoint). */
  def intervalOverlap(a: DataFrame, aKey: String, aStart: String, aEnd: String,
      b: DataFrame, bKey: String, bStart: String, bEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty,
      s"intervalOverlap requires disjoint column names; both sides have: " +
        overlap.mkString(", "))
    require(!a.columns.contains("_bin") && !b.columns.contains("_bin"),
      "intervalOverlap reserves the column name _bin; rename it upstream")

    def binned(df: DataFrame, key: String, s: String, e: String) = df
      .where(col(key).isNotNull && col(s).isNotNull && col(e).isNotNull &&
        col(e) > col(s))
      .withColumn("_bin", explode(sequence(
        floorBin(s"`$s`", binWidth),
        floorBin(s"(`$e` - 1L)", binWidth))))

    binned(a, aKey, aStart, aEnd).as("_ra")
      .join(binned(b, bKey, bStart, bEnd).as("_rb"),
        col("_ra._bin") === col("_rb._bin") &&
          col(s"_ra.`$aKey`") === col(s"_rb.`$bKey`") &&
          // integer floor-div, not float /: epoch-micros exceed double
          // precision, and toward-zero div mis-bins negative times
          col("_ra._bin") ===
            floorBin(s"greatest(`$aStart`, `$bStart`)", binWidth) &&
          col(s"_ra.`$aStart`") < col(s"_rb.`$bEnd`") &&
          col(s"_rb.`$bStart`") < col(s"_ra.`$aEnd`"))
      .select(a.columns.map(c => col(s"_ra.`$c`")).toSeq ++
        b.columns.map(c => col(s"_rb.`$c`")): _*)
  }
}
