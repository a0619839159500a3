package graft.tools

import org.apache.spark.sql.functions._

/** Measures unigram-LM training cost at production-ish vocabulary
  * sizes (round 10): one Spark pass to word counts, then driver-side
  * hard-EM rounds whose per-iteration cost is
  * O(Σ word_len × maxPieceLen) hash lookups. Usage:
  * UnigramTrainProbe [sfDir|synth:<distinctWords>] [vocabSize] [nIters] */
object UnigramTrainProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val vocabSize = if (args.length > 1) args(1).toInt else 8000
    val nIters = if (args.length > 2) args(2).toInt else 2
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    // synth corpus: the BpeTrainProbe generator (one word per row,
    // ~10 copies each, base-26 renderings so substring structure exists)
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
      println(f"[unitrain] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val vocabN = time("wordCounts.count")(
      graft.ops.TextOps.wordCounts(docs).count())
    println(s"[unitrain] distinct words: $vocabN")
    val pieces = time(s"hard-EM vocab=$vocabSize iters=$nIters")(
      graft.ops.TextOps.unigramPieces(docs, vocabSize = vocabSize,
        nIters = nIters).collect())
    println(s"[unitrain] learned ${pieces.length} pieces")
    val enc = time("encode corpus (codegen Viterbi)")(
      graft.ops.TextOps.unigramEncodeFast(docs.select(
          monotonically_increasing_id().as("doc_id"), col("text")),
        pieces.map(r => (r.getString(0), r.getLong(1))).toSeq)
        .agg(sum(col("n_tokens"))).collect().head.getLong(0))
    println(s"[unitrain] corpus tokens: $enc")
    spark.stop()
  }
}
