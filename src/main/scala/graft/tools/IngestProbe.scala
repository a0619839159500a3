package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes the s_substring_ingest bench entry's per-batch cost into
  * its lifecycle phases (round-15 optimization measurement): input
  * fingerprint, excise compute + staged write, fingerprint stage write,
  * staged read-back + sink count, novel-gram append. The bench entry
  * times the whole foreachBatch composition; this probe times the same
  * work phase by phase so the optimization targets the right job.
  * Usage: IngestProbe [sfDir] [runs] */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val runs = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.create(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ingest] $l%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm footers
    (1 to runs).foreach { run =>
      println(s"[ingest] ---- run $run ----")
      val base = java.nio.file.Files.createTempDirectory(s"ingestprobe$run")
      val idxPath = base.resolve("gramidx").toString
      time("saveGramIndex (untimed in bench)")(
        graft.ops.Dedup.saveGramIndex(
          docs.where(pmod(col("doc_id"), lit(2)) === 0), idxPath,
          "text", minLen = 8, buckets = 16))
      // streaming section runs at 4 shuffle partitions
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        Seq(1L, 3L).zipWithIndex.foreach { case (r, j) =>
          val batch = docs.where(pmod(col("doc_id"), lit(4)) === r)
            .localCheckpoint(true)
          println(s"[ingest] -- batch $j (${batch.count()} docs)")
          val fp = time("inputFingerprint")(
            batch.selectExpr("count(1) AS c",
              "coalesce(bit_xor(xxhash64(cast(doc_id AS string))), 0L) AS x",
              "coalesce(bit_xor(xxhash64(cast(doc_id AS string), " +
                "coalesce(cast(text AS string), ''))), 0L) AS t").head())
          val dir = s"$idxPath/ingest_stage/b$j"
          time("excise compute + staged write")(
            graft.ops.Dedup.exciseAgainstIndex(batch, idxPath,
              "doc_id", "text", 8)
              .write.mode("overwrite").parquet(dir))
          time("fp stage write (1-row parquet)") {
            import spark.implicits._
            Seq((fp.getLong(0), fp.getLong(1), fp.getLong(2), "probe"))
              .toDF("c", "x", "t", "run")
              .coalesce(1).write.mode("overwrite").parquet(s"$dir/_input_fp")
          }
          time("staged read-back + sink count")(
            spark.read.parquet(dir).count())
          time("appendToGramIndex")(
            graft.ops.Dedup.appendToGramIndex(batch, idxPath,
              "doc_id", "text"))
        }
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    // the REAL lifecycle end to end (round 16): substringDedupIngestBatch
    // per micro-batch — staging, sink delivery and append exactly as the
    // bench's streaming entry runs them (count sink), so staged-artifact
    // changes show here, which the manual phases above cannot see
    (1 to runs).foreach { run =>
      println(s"[ingest] ---- lifecycle run $run ----")
      val base = java.nio.file.Files.createTempDirectory(s"ingestlife$run")
      val idxPath = base.resolve("gramidx").toString
      graft.ops.Dedup.saveGramIndex(
        docs.where(pmod(col("doc_id"), lit(2)) === 0), idxPath,
        "text", minLen = 8, buckets = 16)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try Seq(1L, 3L).zipWithIndex.foreach { case (r, j) =>
        val batch = docs.where(pmod(col("doc_id"), lit(4)) === r)
          .localCheckpoint(true)
        var n = 0L
        time(s"ingestBatch $j (full lifecycle)")(
          graft.streaming.StreamOps.substringDedupIngestBatch(
            batch, j.toLong, idxPath, "doc_id", "text", minLen = 8,
            runId = s"probe$run") { (c, _) => n = c.count() })
        println(s"[ingest] delivered $n rows")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
