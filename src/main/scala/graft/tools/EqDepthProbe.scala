package graft.tools

import org.apache.spark.sql.functions._

/** Stage-by-stage floor decomposition of q_histogram_eqdepth (VERDICT
  * r10 #4 closure): times cumulative prefixes of the pipeline — the
  * domain aggregate, the level-0 window, each subtotal level, the
  * join-back, the final bin aggregate — plus the whole query with AQE
  * on and off, and reports job/stage counts from a listener. The
  * numbers behind BENCH_NOTES.md's floor table. */
object EqDepthProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 5
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageSubmitted(
            s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          stages.incrementAndGet()
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def timeBest(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val best = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      stages.set(0); jobs.set(0)
      df.queryExecution.toRdd.count()
      // listener events arrive on an async bus — give it a moment to
      // drain before reading the counters (diagnostic-grade sync)
      Thread.sleep(1000)
      println(f"[eqd] $label%-34s best $best%5.2f s  " +
        f"jobs ${jobs.get}%2d stages ${stages.get}%2d")
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val unit = round(col("l_extendedprice").cast(
        org.apache.spark.sql.types.DecimalType(18, 2)) * 100L, 0)
      .cast("long")
    def cnts = li.where(col("l_extendedprice").isNotNull &&
        !isnan(col("l_extendedprice").cast("double")))
      .groupBy(unit.as("u")).agg(count(lit(1)).as("n_v"))
    timeBest("domain aggregate (cnts)")(cnts)
    timeBest("+ full cascade (domainPrefix)")(
      graft.ops.Profile.domainPrefix(cnts, "u", Seq("n_v")))
    timeBest("+ bin + final agg (whole query)")(
      graft.SparkEntry.queries("q_histogram_eqdepth")(spark, sf))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timeBest("whole query, AQE off")(
      graft.SparkEntry.queries("q_histogram_eqdepth")(spark, sf))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
