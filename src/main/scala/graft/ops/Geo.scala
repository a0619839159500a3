package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar radius self-join over integer coordinates — the spatial
  * blocking primitive ("all point pairs within distance r") behind
  * geo dedup, store-catchment overlap, and sensor co-location, built
  * the same way the text near-dup family is: cell-bucketed candidate
  * generation through an EQUI join, exact confirm, never a cross join.
  *
  * (Extension surface — the reference engine has no spatial operators;
  * the candidate-generation shape follows ops/RangeJoin's bin-sharding
  * and ops/Dedup's banded joins.)
  *
  * Coordinates are integer micro-degrees (or any integer unit); a
  * candidate pair from adjacent cells is at most 2·radius apart per
  * axis, so with radius ≤ 2^30 the squared Euclidean distance stays an
  * EXACT BIGINT (8·r² ≤ 2^63−1) and the r² comparison is
  * integer-exact on every engine — no haversine, no libm, no float
  * tolerance. For
  * city-scale radii the planar metric is the standard approximation;
  * a true great-circle confirm would slot into the same candidate
  * pipeline.
  *
  * Exactly-once construction: every point gets ONE home cell (floor
  * division by the cell edge = radius); the left side joins its home
  * cell against the right side's exploded 3x3 cell neighborhood. A
  * qualifying pair (dist <= r) always lands in adjacent-or-equal
  *  cells, the neighborhood contains each specific cell once, and the
  * `a_id < b_id` orientation keeps one row per unordered pair — so no
  * dedup pass exists to get wrong.
  *
  * Scale shape: one equi-join keyed on (cx, cy) — the right side
  * carries 9 rows per point (ids + 2 longs, never payload), candidates
  * are confined to ~r-sized neighborhoods, and skewed dense cells are
  * ordinary join skew (AQE splits them). No CartesianProduct at any
  * size; GeoSpec pins it. */
object Geo {

  /** Floor division robust to negative coordinates (`div` truncates
    * toward zero, which would merge cells -1 and +1 around the
    * origin). `x - pmod(x, c)` is an exact multiple of c well below
    * 2^53, so the double division is exact. */
  private def cellOf(c: Column, edge: Long): Column =
    ((c - pmod(c, lit(edge))) / lit(edge)).cast("long")

  /** All unordered point pairs within `radius` (inclusive, squared-
    * integer metric). Output: (a_id, b_id, dist2) with a_id < b_id. */
  def radiusPairs(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    require(radius > 0, "radius must be positive")
    // candidates from adjacent cells can be up to 2·radius apart PER
    // AXIS, so dist2 reaches 8r² — exactness needs 8r² ≤ 2^63−1, i.e.
    // r ≤ 2^30 (the previous 2e9 bound let a wrapped-negative dist2
    // pass the <= r² filter and emit a pair ~2r apart as in-range)
    require(radius <= (1L << 30),
      s"radius beyond the exact-BIGINT domain (8*r*r must fit a " +
        s"BIGINT): max ${1L << 30}, got $radius")
    val a = points.select(col(idCol).as("a_id"),
      col(xCol).cast("long").as("ax"), col(yCol).cast("long").as("ay"))
      .withColumn("cx", cellOf(col("ax"), radius))
      .withColumn("cy", cellOf(col("ay"), radius))
    val b = points.select(col(idCol).as("b_id"),
        col(xCol).cast("long").as("bx"), col(yCol).cast("long").as("by"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("b_id"), col("bx"), col("by"),
        (cellOf(col("bx"), radius) + col("dx")).as("cx"),
        (cellOf(col("by"), radius) + col("dy")).as("cy"))
    a.join(b, Seq("cx", "cy"))
      .where(col("a_id") < col("b_id"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .where(col("dist2") <= lit(radius * radius))
      .select(col("a_id"), col("b_id"), col("dist2"))
  }

  /** Nearest neighbor within `radius` for every point (the "closest
    * store" form): rank the radius pairs per anchor and keep rank 1,
    * ties broken by neighbor id. Points with no neighbor in range are
    * absent. Both orientations of each pair are ranked, so every point
    * is an anchor. */
  def nearestWithin(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    val pairs = radiusPairs(points, idCol, xCol, yCol, radius)
    val both = pairs
      .select(col("a_id").as("id"), col("b_id").as("nn_id"), col("dist2"))
      .unionByName(pairs.select(col("b_id").as("id"),
        col("a_id").as("nn_id"), col("dist2")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("dist2"), col("nn_id"))
    both.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
  }
}
