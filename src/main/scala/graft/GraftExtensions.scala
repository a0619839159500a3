package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: makes the engine's custom Catalyst
  * expressions available on ANY session built with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * — the deployment path for clusters where code can't call
  * [[Graft.init]] on each session (e.g. Thrift server, notebooks).
  * Injected functions resolve in SQL text and via `call_function`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_f"),
      info("dot_f", "dot_f(a, b) - double dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a string array"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("shingle_hash64"),
      info("shingle_hash64", "shingle_hash64(text, n) - distinct n-gram hashes"),
      (es: Seq[Expression]) => ShingleHash64(es(0), GraftExtensions.foldInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation minhash signature"),
      (es: Seq[Expression]) => MinHashSig(es(0), GraftExtensions.foldInt(es(1)))))
  }
}

object GraftExtensions {
  private[graft] def foldInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"expected a literal int, got $other")
  }
}
