package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** ops/Layout: a clustered rewrite must change only the physical layout —
  * same rows back, range predicate pushed to the scan, and the written
  * files must cover disjoint cluster-key ranges (the property row-group
  * stat pruning depends on). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val src = spark.read.parquet(s"$sfDir/lineitem.parquet")

  private def clusteredPath(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft-layout-spec")
      .resolve("lineitem").toString
    Layout.writeClustered(src, path, 4, "l_shipdate")
    path
  }

  test("readback equals the source, filtered or not") {
    val path = clusteredPath()
    val back = spark.read.parquet(path)
    assert(back.count() == src.count())
    val pred = col("l_shipdate") >= "1996-03-01" && col("l_shipdate") < "1996-04-01"
    val a = back.where(pred).groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toSet
    val b = src.where(pred).groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toSet
    assert(a.nonEmpty && a == b)
  }

  test("range predicate reaches the clustered scan as a pushed filter") {
    val path = clusteredPath()
    val plan = spark.read.parquet(path)
      .where(col("l_shipdate") >= "1996-03-01")
      .select("l_shipdate", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate,"), s"no pushdown:\n$plan")
    // column pruning intact through the rewrite (2 of 16 columns read)
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_shipdate:timestamp_ntz>"),
      s"scan reads more than the projection:\n$plan")
  }

  test("files cover disjoint shipdate ranges (the stat-pruning contract)") {
    val path = clusteredPath()
    val ranges = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("l_shipdate"))
      .groupBy("f").agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
      .select("lo", "hi").as[(String, String)].collect()
      .sortBy(_._1)
    assert(ranges.length == 4) // numFiles respected
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("rejects bad arguments up front") {
    intercept[IllegalArgumentException] { Layout.writeClustered(src, "/tmp/x", 0, "l_shipdate") }
    intercept[IllegalArgumentException] { Layout.writeClustered(src, "/tmp/x", 4) }
  }
}
