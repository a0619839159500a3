package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** ops/RangeJoin: the bin-bucketed point-in-interval join must equal the
  * naive theta-join on every fixture, and the binning must not duplicate
  * or drop matches at bin boundaries. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(rows: (Long, Long, Long)*) =
    rows.toDF("pid", "k", "t")
  private def intervals(rows: (Long, Long, Long, Long)*) =
    rows.toDF("iid", "ik", "s", "e")

  test("equals the brute-force theta join on the events fixture") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(df => df.withColumn("ts_us", graft.ops.TimeSeries.epochMicros(df)))
    val day = 86400000000L
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_start"), (col("ts_us") + day).as("p_end"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val binned = RangeJoin.pointInInterval(c, "user_id", "ts_us",
        p, "p_user", "p_start", "p_end", binWidth = day)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    val brute = c.join(p, col("user_id") === col("p_user") &&
        col("ts_us") >= col("p_start") && col("ts_us") < col("p_end"))
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(binned.nonEmpty && binned == brute)
  }

  test("half-open bounds: start matches, end does not") {
    val r = RangeJoin.pointInInterval(
        points((1L, 1L, 100L), (2L, 1L, 200L)), "k", "t",
        intervals((10L, 1L, 100L, 200L)), "ik", "s", "e", binWidth = 50L)
      .select("pid").as[Long].collect().toSet
    assert(r == Set(1L)) // t=100 in [100,200); t=200 out
  }

  test("an interval spanning many bins matches each point exactly once") {
    // interval covers bins 0..9; points in distinct bins and at bin edges
    val r = RangeJoin.pointInInterval(
        points((1L, 7L, 0L), (2L, 7L, 99L), (3L, 7L, 500L), (4L, 7L, 999L),
          (5L, 7L, 1000L)), "k", "t",
        intervals((1L, 7L, 0L, 1000L)), "ik", "s", "e", binWidth = 100L)
      .groupBy("pid").count().as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)) // 1000 excluded
  }

  test("degenerate and NULL rows match nothing; other keys don't leak") {
    val p = Seq((1L, Option(1L), Option(50L)), (2L, None, Option(50L)),
        (3L, Option(1L), None), (4L, Option(2L), Option(50L)))
      .toDF("pid", "k", "t")
    val iv = Seq((10L, Option(1L), Option(0L), Option(100L)),
        (11L, Option(1L), Option(80L), Option(80L)), // empty [80, 80)
        (12L, Option(1L), Option(90L), Option(10L)), // inverted
        (13L, Option(3L), None, Option(100L)))
      .toDF("iid", "ik", "s", "e")
    val r = RangeJoin.pointInInterval(p, "k", "t", iv, "ik", "s", "e", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(r == Set((1L, 10L)))
  }

  test("rejects bad arguments up front") {
    val p = points((1L, 1L, 1L))
    val iv = intervals((1L, 1L, 0L, 2L))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "k", "t", iv, "ik", "s", "e", 0L)
    }
    intercept[IllegalArgumentException] { // overlapping column names
      RangeJoin.pointInInterval(p, "k", "t",
        iv.withColumnRenamed("iid", "pid"), "ik", "s", "e", 10L)
    }
    intercept[IllegalArgumentException] { // reserved _bin
      RangeJoin.pointInInterval(p.withColumnRenamed("pid", "_bin"), "k", "t",
        iv, "ik", "s", "e", 10L)
    }
  }

  test("interval overlap equals the brute-force theta join on the events fixture") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(df => df.withColumn("ts_us", graft.ops.TimeSeries.epochMicros(df)))
    val day = 86400000000L
    def w(id: String, k: String, s: String, e: String) =
      ev.where(col("event_type") === "purchase")
        .select(col("event_id").as(id), col("user_id").as(k),
          col("ts_us").as(s), (col("ts_us") + day).as(e))
    val binned = RangeJoin.intervalOverlap(
        w("a_id", "a_user", "a_s", "a_e"), "a_user", "a_s", "a_e",
        w("b_id", "b_user", "b_s", "b_e"), "b_user", "b_s", "b_e", day)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val brute = w("a_id", "a_user", "a_s", "a_e")
      .join(w("b_id", "b_user", "b_s", "b_e"),
        col("a_user") === col("b_user") &&
          col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    // set-equal AND multiplicity-equal: the ownership-bin rule must make
    // each overlapping pair match exactly once, never once per shared bin
    assert(binned.nonEmpty)
    assert(binned.groupBy(identity).view.mapValues(_.size).toMap ==
      brute.groupBy(identity).view.mapValues(_.size).toMap)
  }

  test("interval overlap: bin-spanning pairs match once; touching intervals don't") {
    def iv(rows: (Long, Long, Long, Long)*) = rows.toDF("aid", "ak", "as_", "ae")
    def jv(rows: (Long, Long, Long, Long)*) = rows.toDF("bid", "bk", "bs", "be")
    val r = RangeJoin.intervalOverlap(
        // a1 spans bins 0..9, a2 is empty-adjacent later
        iv((1L, 1L, 0L, 1000L), (2L, 1L, 1000L, 1100L)), "ak", "as_", "ae",
        // b1 overlaps a1 across many shared bins; b2 only TOUCHES a1 at
        // t=1000 (half-open: no overlap); b3 overlaps both a1 and a2
        jv((10L, 1L, 500L, 900L), (11L, 1L, 1000L, 1050L), (12L, 1L, 950L, 1020L)),
        "bk", "bs", "be", binWidth = 100L)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    assert(r.groupBy(identity).view.mapValues(_.size).toMap == Map(
      (1L, 10L) -> 1, (1L, 12L) -> 1, (2L, 11L) -> 1, (2L, 12L) -> 1))
  }

  test("candidate generation is an equi-join on (key, bin), not a cartesian") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .transform(df => df.withColumn("ts_us", graft.ops.TimeSeries.epochMicros(df)))
    val day = 86400000000L
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts_us").as("p_start"), (col("ts_us") + day).as("p_end"))
    val c = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"))
    val plan = RangeJoin.pointInInterval(c, "user_id", "ts_us",
        p, "p_user", "p_start", "p_end", binWidth = day)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
  }
}
