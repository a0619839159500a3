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
    val nGroups = spark.read.parquet(
      graft.ops.Rollup.currentDataPath(spark, roll)).count()
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

    // ---- incremental refresh vs full rebuild (VERDICT r13 #4) -------
    // the nightly-ingest shape: a private copy of the base grows by a
    // ~1% append after its rollup was built; `refresh` must price at
    // new-data-plus-merge (independent of base size), a full
    // `saveRollup` rebuild at 101% of the base scan (linear in it).
    // Three base sizes (sf1 and 4x/16x self-replications) expose the
    // two growth terms: the rebuild scales with the base, the refresh
    // stays flat — the crossover is what "never a base rescan" is
    // worth, and at 100 TB the rebuild term is the whole corpus.
    val cols = Seq("l_returnflag", "l_linestatus", "l_shipdate",
      "l_quantity", "l_extendedprice")
    val sel = spark.read.parquet(basePath).select(cols.head, cols.tail: _*)
    val slice = spark.read.parquet(basePath)
      .where(pmod(col("l_orderkey"), lit(100)) === 0)
      .select(cols.head, cols.tail: _*)
    for (mult <- Seq(1, 4, 16)) {
      val work = java.nio.file.Files
        .createTempDirectory(s"graft-rollup-refresh-probe-x$mult")
      val bp = work.resolve("base").toString
      Iterator.fill(mult)(sel).reduce(_ unionAll _).write.parquet(bp)
      val rp = work.resolve("roll").toString
      val tBuild = System.nanoTime()
      graft.ops.Rollup.saveRollup(spark.read.parquet(bp), rp,
        dims = Seq("l_returnflag", "l_linestatus", "l_shipdate"),
        measures = Seq("l_quantity", "l_extendedprice"))
      println(f"[refresh x$mult] initial build: " +
        f"${(System.nanoTime() - tBuild) / 1e9}%.2f s")
      // the append: a deterministic slice, SAME absolute size at both
      // multipliers (a night's ingest doesn't grow because history did)
      val nAppend = slice.count()
      slice.write.mode("append").parquet(bp)
      val nBase = spark.read.parquet(bp).count()
      println(s"[refresh x$mult] appended $nAppend of $nBase rows")
      val tRef = System.nanoTime()
      // register=false: the parity check below must collect its
      // "direct" answer UNROUTED — with the default re-registration it
      // would compare the routed plan against itself and hold
      // vacuously even on a broken refresh (review finding, r14)
      val folded = graft.ops.Rollup.refresh(spark, bp, rp,
        register = false)
      val refreshS = (System.nanoTime() - tRef) / 1e9
      println(f"[refresh x$mult] refresh ($folded new files): $refreshS%.2f s")
      // the alternative: rebuild from scratch over the grown base
      val rp2 = work.resolve("roll2").toString
      val tReb = System.nanoTime()
      graft.ops.Rollup.saveRollup(spark.read.parquet(bp), rp2,
        dims = Seq("l_returnflag", "l_linestatus", "l_shipdate"),
        measures = Seq("l_quantity", "l_extendedprice"))
      val rebuildS = (System.nanoTime() - tReb) / 1e9
      println(f"[refresh x$mult] full rebuild: $rebuildS%.2f s " +
        f"(refresh = ${refreshS / rebuildS}%.2fx of a rebuild)")
      // parity: the routed answer over the refreshed artifact equals
      // the direct scan of the grown base
      def qb() = spark.read.parquet(bp)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          avg("l_extendedprice").as("avg_price"),
          max("l_extendedprice").as("max_price"))
      val directRows = qb().collect().map(_.toString).sorted.toSeq
      graft.ops.Rollup.register(spark, bp, rp)
      val routedQ = qb()
      val isRouted = routedQ.queryExecution.optimizedPlan.collectFirst {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains(rp))
            case _ => false
          }
      }.getOrElse(false)
      val routedRows = routedQ.collect().map(_.toString).sorted.toSeq
      graft.ops.Rollup.unregister(spark, bp)
      println(s"[refresh x$mult] routed plan: $isRouted; parity: " +
        s"${routedRows == directRows}")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(work.toFile)
    }
    spark.stop()
  }
}
