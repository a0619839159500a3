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

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${es.length}")
      build(es)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("dot_f"),
      info("dot_f", "dot_f(a, b) - double dot product of two float arrays"),
      arity("dot_f", 2)(es => DotProduct(es(0), es(1)))))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      arity("cosine_sim", 2)(es => CosineSimilarity(es(0), es(1)))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a string array"),
      arity("simhash64", 1)(es => SimHash64(es.head))))
    ext.injectFunction((FunctionIdentifier("shingle_hash64"),
      info("shingle_hash64", "shingle_hash64(text, n) - distinct n-gram hashes"),
      arity("shingle_hash64", 2)(es =>
        ShingleHash64(es(0), ShingleExprs.foldInt(es(1))))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation minhash signature"),
      arity("minhash_sig", 2)(es =>
        MinHashSig(es(0), ShingleExprs.foldInt(es(1))))))
    ext.injectFunction((FunctionIdentifier("shingle_anchors"),
      info("shingle_anchors",
        "shingle_anchors(text, n) - positional n-gram anchor hashes " +
          "(element i = chain hash of words i+1..i+n; < n words -> empty)"),
      arity("shingle_anchors", 2)(es =>
        ShingleAnchors(es(0), ShingleExprs.foldInt(es(1))))))
    ext.injectFunction((FunctionIdentifier("md5_bucket_grams"),
      info("md5_bucket_grams",
        "md5_bucket_grams(text, n) - md5-bucket ids of every unigram and " +
          "bigram (conv(substring(md5(f),1,8),16,10) % n per gram)"),
      arity("md5_bucket_grams", 2)(es =>
        Md5BucketGrams(es(0), ShingleExprs.foldInt(es(1))))))
    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      info("unicode_normalize",
        "unicode_normalize(s, form) - Unicode NFC/NFD/NFKC/NFKD normalization"),
      arity("unicode_normalize", 2)(es =>
        UnicodeNormalize(es(0), es(1).eval(null) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"unicode_normalize form must be a string literal, got $other")
        }))))
    ext.injectFunction((FunctionIdentifier("sortable_f64"),
      info("sortable_f64",
        "sortable_f64(x) - order-preserving long image of a double's IEEE bits"),
      arity("sortable_f64", 1)(es => SortableF64(es.head))))
    ext.injectFunction((FunctionIdentifier("sortable_f64_inv"),
      info("sortable_f64_inv",
        "sortable_f64_inv(s) - the double whose sortable_f64 image is s"),
      arity("sortable_f64_inv", 1)(es => SortableF64Inv(es.head))))
    ext.injectFunction((FunctionIdentifier("bpe_encode"),
      info("bpe_encode",
        "bpe_encode(text, merges) - BPE tokenization; merges is the " +
          "U+0001/U+0000-encoded rule-list literal BpeEncode.bpeEncode builds"),
      arity("bpe_encode", 2)(es =>
        BpeEncode(es(0), es(1).eval(null) match {
          case s: org.apache.spark.unsafe.types.UTF8String =>
            BpeEncode.decodeMerges(s.toString)
          case other => throw new IllegalArgumentException(
            s"bpe_encode merges must be a string literal, got $other")
        }))))
    ext.injectFunction((FunctionIdentifier("bottom_k"),
      info("bottom_k",
        "bottom_k(h, k) - aggregate: sorted array of the k smallest " +
          "distinct bigint values (the grouped KMV selection)"),
      arity("bottom_k", 2)(es =>
        BottomKLongs(es(0), ShingleExprs.foldInt(es(1))))))
    ext.injectFunction((FunctionIdentifier("bottom_k_by"),
      info("bottom_k_by",
        "bottom_k_by(sortKey, payload, k) - aggregate: (s, p) structs " +
          "of the k lexicographically smallest distinct (sortKey, " +
          "payload) bigint pairs, in selection order"),
      arity("bottom_k_by", 3)(es =>
        BottomKPairs(es(0), es(1), ShingleExprs.foldInt(es(2))))))
    // rollup routing: answer Rollup.register'd aggregations from the
    // saved rollup instead of the base scan (same rule Graft.init
    // installs via extraOptimizations; double-installation is safe —
    // the rewrite never matches its own output)
    ext.injectOptimizerRule(_ => graft.plans.RollupRouting)
  }
}
