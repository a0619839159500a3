package graft.tools

import org.apache.spark.sql.functions._

/** Measures what rollup routing buys: the same pricing-summary-shaped
  * aggregation over sf1 lineitem (6M rows), answered (a) by the direct
  * base scan and (b) by the routed read of a saved
  * (l_returnflag, l_linestatus, month) rollup. The ratio is the
  * SCALING.md evidence; at 100 TB the gap is the whole corpus scan. */
object RollupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    val basePath = s"$sfDir/lineitem.parquet"
    val roll = java.nio.file.Files
      .createTempDirectory("graft-rollup-probe").toString
    val t0 = System.nanoTime()
    // raw columns only — a computed dim (e.g. date_trunc month) is
    // outside the routing surface by design; l_shipdate itself is the
    // finest time grain and keeps the rollup at |flags| x |status| x
    // |distinct dates| ~ 20k rows
    graft.ops.Rollup.saveRollup(spark.read.parquet(basePath), roll,
      dims = Seq("l_returnflag", "l_linestatus", "l_shipdate"),
      measures = Seq("l_quantity", "l_extendedprice"))
    println(f"[rollup] build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val nGroups = spark.read.parquet(s"$roll/data").count()
    println(s"[rollup] groups: $nGroups")

    def q() = spark.read.parquet(basePath)
      .where(col("l_returnflag") =!= "R")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))

    def timed(label: String): Double = {
      val samples = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t = System.nanoTime()
        q().queryExecution.toRdd.count()
        (System.nanoTime() - t) / 1e9
      }.sorted
      println(f"[rollup] $label: ${samples(1)}%.3f s (min ${samples.head}%.3f)")
      samples(1)
    }

    timed("warmup")
    val direct = timed("direct")
    graft.ops.Rollup.register(spark, basePath, roll)
    val routed = timed("routed")
    graft.ops.Rollup.unregister(spark, basePath)
    println(f"[rollup] speedup: ${direct / routed}%.1fx")
    spark.stop()
  }
}
