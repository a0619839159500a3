package graft.tools

import org.apache.spark.sql.functions._

/** Measures the incremental substring-dedup lifecycle (rounds 10–11):
  * index the corpus's gram inventory once, then per batch size — excise
  * an ingest batch against it AND append the accepted batch's novel
  * grams (the round-11 lifecycle step). The probe should cost
  * batch-shaped work plus a bucket-pruned index semi-join, never a
  * corpus re-read; the per-doc cost should FALL with batch size (the
  * fixed per-probe stage latency amortizes — the "batch a day's
  * ingest" advice, VERDICT r10 #8). Usage:
  * GramIndexProbe [sfDir] [batchDocs,batchDocs,...] */
object GramIndexProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batchNs = (if (args.length > 1) args(1) else "200,2000,20000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gramidx] $l%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[gramidx] corpus docs: ${docs.count()}")
    for (batchN <- batchNs) {
      // fresh index per size so appends don't cross-contaminate sizes
      val tmp = java.nio.file.Files
        .createTempDirectory(s"gramidx$batchN").toString
      time(s"saveGramIndex (n=$batchN run)")(
        graft.ops.Dedup.saveGramIndex(docs, tmp, "text", 8, 256))
      val batch = docs.limit(batchN)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        .localCheckpoint(true) // batch construction out of the probe time
      val removed = time(s"exciseAgainstIndex $batchN docs")(
        graft.ops.Dedup.exciseAgainstIndex(batch, tmp, "doc_id", "text", 8)
          .agg(sum(col("removed_tokens"))).head.getLong(0))
      println(s"[gramidx] removed tokens: $removed")
      time(s"appendToGramIndex $batchN docs")(
        graft.ops.Dedup.appendToGramIndex(batch, tmp, "doc_id", "text"))
    }
    spark.stop()
  }
}
