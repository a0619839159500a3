package graft

import org.apache.spark.sql.functions._
import graft.ops.Geo

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long, Long)], r: Long) =
    (for {
      (ai, ax, ay) <- pts; (bi, bx, by) <- pts
      if ai < bi
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= r * r
    } yield (ai, bi, d2)).sorted

  test("radiusPairs equals brute force, negative coords included") {
    // a cluster straddling the origin (the floor-division trap), a
    // distant pair, and an isolated point
    val pts = Seq(
      (1L, -3L, -3L), (2L, 2L, 2L), (3L, 5L, 5L), (4L, -8L, 4L),
      (5L, 100L, 100L), (6L, 104L, 97L), (7L, 5000L, -5000L))
    val got = Geo.radiusPairs(pts.toDF("pid", "x", "y"), "pid", "x", "y", 10L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == brute(pts, 10L))
    assert(got.nonEmpty)
  }

  test("radiusPairs: radius boundary is inclusive, beyond excluded") {
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 4L), (3L, 3L, 5L))
      .toDF("pid", "x", "y")
    val got = Geo.radiusPairs(pts, "pid", "x", "y", 5L)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // (1,2) at dist exactly 5 stays; (1,3) at sqrt(34) > 5 goes;
    // (2,3) at dist 1 stays
    assert(got == Seq((1L, 2L, 25L), (2L, 3L, 1L)))
  }

  test("radiusPairs: each qualifying pair appears exactly once") {
    // dense grid where many points share cells and neighborhoods —
    // any double-count in the 3x3 explode shows up as duplicates
    val pts = for (i <- 0L until 6L; j <- 0L until 6L)
      yield (i * 6 + j, i * 3, j * 3)
    val got = Geo.radiusPairs(pts.toDF("pid", "x", "y"), "pid", "x", "y", 7L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size, "duplicated pair rows")
    assert(got.sorted == brute(pts, 7L))
  }

  test("radiusPairs: radii past the exact-BIGINT domain are rejected " +
      "(dist2 can reach 8r^2 for adjacent-cell candidates)") {
    val pts = Seq((1L, 0L, 0L)).toDF("pid", "x", "y")
    // the old 2e9 bound admitted wrapped-negative dist2 values that
    // passed the <= r^2 filter (a pair ~2r apart emitted as in-range)
    intercept[IllegalArgumentException] {
      Geo.radiusPairs(pts, "pid", "x", "y", (1L << 30) + 1) }
    // the max exact radius still runs (and finds nothing here)
    assert(Geo.radiusPairs(pts, "pid", "x", "y", 1L << 30).isEmpty)
  }

  test("nearestWithin: rank-1 neighbor per anchor, ties on id") {
    val pts = Seq(
      (1L, 0L, 0L), (2L, 4L, 0L), (3L, -4L, 0L), // 2 and 3 tie for 1
      (4L, 100L, 0L))                            // isolated -> absent
    val got = Geo.nearestWithin(pts.toDF("pid", "x", "y"),
        "pid", "x", "y", 10L)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 2L, 16L), (2L, 1L, 16L), (3L, 1L, 16L)))
  }

  test("plan: cell-keyed equi join, never a cartesian product") {
    val pts = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("pid"),
        (col("c_custkey") * 37 % 1000).as("x"),
        (col("c_custkey") * 91 % 1000).as("y"))
    val plan = Geo.radiusPairs(pts, "pid", "x", "y", 50L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join shape in:\n$plan")
  }
}
