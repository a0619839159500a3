package graft.tools

import org.apache.spark.sql.functions._

/** Measures BPE training cost at production-ish merge counts (round
  * 10): the driver-side trainer (one Spark pass to word counts, then
  * in-memory rounds) vs the per-round Spark loop (one
  * driver-synchronized job per merge). Usage:
  * BpeTrainProbe [sfDir] [driverMerges] [loopMerges] */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nFast = if (args.length > 1) args(1).toInt else 1000
    val nLoop = if (args.length > 2) args(2).toInt else 50
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    // "synth:<distinctWords>" builds a corpus with a realistic-sized
    // vocabulary (the fixture's documents table holds only ~31 distinct
    // words — too small to exercise production merge counts): one word
    // per row, ~10 copies each, words = base-26 renderings of the id so
    // character structure exists for merges to find
    val docs =
      if (sf.startsWith("synth:")) {
        val v = sf.stripPrefix("synth:").toLong
        spark.range(10 * v).select(
          concat(lit("w"), conv((col("id") % v).cast("string"), 10, 26))
            .as("text"))
      } else spark.read.parquet(s"$sf/documents.parquet")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpetrain] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val vocabN = time("wordCounts.count")(
      graft.ops.TextOps.wordCounts(docs).count())
    println(s"[bpetrain] distinct words: $vocabN")
    val fast = time(s"driver trainer x$nFast")(
      graft.ops.TextOps.bpeMerges(docs, numMerges = nFast, minCount = 2)
        .collect())
    println(s"[bpetrain] driver learned ${fast.length} rules")
    val loop = time(s"spark loop    x$nLoop")(
      graft.ops.TextOps.bpeMergesDistributed(docs, numMerges = nLoop,
        minCount = 2).collect())
    println(s"[bpetrain] loop learned ${loop.length} rules")
    // rule-for-rule agreement on the shared prefix
    val agree = fast.take(nLoop).map(_.toString)
      .sameElements(loop.map(_.toString))
    println(s"[bpetrain] shared-prefix rules equal: $agree")
    spark.stop()
  }
}
