package graft.tools

import org.apache.spark.sql.functions._

/** Measures the incremental substring-dedup path (round 10): index the
  * corpus's gram inventory once, then excise a small ingest batch
  * against it — the probe should cost batch-shaped work plus a
  * bucket-pruned index semi-join, never a corpus re-read. Usage:
  * GramIndexProbe [sfDir] [batchDocs] */
object GramIndexProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val batchN = if (args.length > 1) args(1).toInt else 200
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[gramidx] $l%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    println(s"[gramidx] corpus docs: ${docs.count()}")
    val tmp = java.nio.file.Files.createTempDirectory("gramidx").toString
    time("saveGramIndex")(
      graft.ops.Dedup.saveGramIndex(docs, tmp, "text", 8, 256))
    val batch = docs.limit(batchN)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val removed = time(s"exciseAgainstIndex $batchN docs")(
      graft.ops.Dedup.exciseAgainstIndex(batch, tmp, "doc_id", "text", 8)
        .agg(sum(col("removed_tokens"))).head.getLong(0))
    println(s"[gramidx] removed tokens: $removed")
    spark.stop()
  }
}
