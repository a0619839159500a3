package graft

import org.apache.spark.sql.functions._
import graft.ops.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("resampleFfill fills gap buckets with the latest earlier value") {
    // user 1: buckets 10 and 13 (gap 11, 12); user 2: single bucket
    val ev = Seq((1L, 10L, 5.0), (1L, 10L, 3.0), (1L, 13L, 7.0),
      (2L, 20L, 1.0)).toDF("user_id", "b", "value")
    val out = TimeSeries.resampleFfill(ev, "user_id", col("b"),
        aggs = Seq(count(lit(1)).as("n"), sum("value").as("v")),
        fillCols = Seq("v"))
      .select(col("user_id"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("v"))
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 10L, 2L, 8.0),  // data point keeps its own aggregate
      (1L, 11L, 0L, 8.0),  // gap carries the latest earlier value
      (1L, 12L, 0L, 8.0),
      (1L, 13L, 1L, 7.0),  // next data point overrides
      (2L, 20L, 1L, 1.0))) // single-bucket key: grid of one
  }

  test("resampleFfill grid is bounded per key, not global") {
    val ev = Seq((1L, 0L, 1.0), (1L, 2L, 1.0),
      (2L, 1000L, 1.0), (2L, 1001L, 1.0)).toDF("user_id", "b", "value")
    val n = TimeSeries.resampleFfill(ev, "user_id", col("b"),
      aggs = Seq(sum("value").as("v")), fillCols = Seq("v")).count()
    // 3 buckets for key 1 (0..2) + 2 for key 2 (1000..1001) — NOT
    // 1002 x 2 rows of a global time-axis product
    assert(n == 5)
  }
}
