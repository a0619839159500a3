package graft.tools

import org.apache.spark.sql.functions._

/** Prices the STREAMING routable-rollup fold (VERDICT r14 #5 — the
  * batch refresh got its measurement in r14; this is the streaming
  * sibling's): [[graft.streaming.StreamOps.applyRoutableRollupBatch]]
  * re-reads the current artifact snapshot, aggregates the micro-batch
  * into a delta, unions + re-aggregates, and commits a fresh version
  * per fold — so the per-fold cost must be artifact-cardinality-sized
  * plus batch-sized, and INDEPENDENT of how many folds came before
  * (the stream's history never re-enters the fold). This probe folds
  * N fixed-size micro-batches at three dim cardinalities and reports
  * first-fold and steady-state latency; the flat fold-over-fold curve
  * and the cardinality term are the SCALING.md row.
  *
  * Every batch covers the full dim space, so the artifact reaches its
  * cardinality on fold 0 and stays there — the steady state a
  * long-running stream lives in, and the worst case for the
  * union+re-aggregate term (every group is touched every fold). */
object StreamRollupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    val folds = if (args.length > 0) args(0).toInt else 8
    val batchRows = 500000L
    for (card <- Seq(1500, 15000, 150000)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-stream-roll-$card").toString
      val times = (0 until folds).map { b =>
        // integer div/mod (col / lit on longs is DOUBLE division —
        // the fractional remainders would silently multiply the
        // intended cardinality)
        val batch = spark.range(b * batchRows, (b + 1) * batchRows)
          .select(
            (col("id") % 50).cast("string").as("d1"),
            expr(s"(id div 50) % ${card / 50}").cast("string").as("d2"),
            (col("id") % 1000).as("m"))
        val t = System.nanoTime()
        val ok = graft.streaming.StreamOps.applyRoutableRollupBatch(
          path, batch, b.toLong, Seq("d1", "d2"), Seq("m"),
          runId = "probe")
        require(ok, s"fold $b was fenced out")
        (System.nanoTime() - t) / 1e9
      }
      val groups = spark.read.parquet(
        graft.streaming.StreamOps.currentLocalDataDir(path).getPath)
        .count()
      val steady = times.drop(2)
      println(f"[stream-rollup] card=$groups%7d first=${times.head}%.2f s" +
        f" steady=${steady.sum / steady.size}%.2f s" +
        f" (min ${steady.min}%.2f, max ${steady.max}%.2f)" +
        f" over $folds folds of $batchRows rows")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(path))
    }
    spark.stop()
  }
}
