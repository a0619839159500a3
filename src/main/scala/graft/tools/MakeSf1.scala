package graft.tools

import org.apache.spark.sql.functions._

/** Generates an sf1 slice (10x sf0.1) for the heavy text/embedding
  * families so ScalingCurve can measure a 1000x span (sf0.001 -> sf1)
  * instead of arguing the last decade from plan shapes.
  *
  * Replication alone would be wrong: ten verbatim copies of every doc
  * give each document nine exact near-duplicates, so candidate
  * generation (MinHash bands, span anchors) would grow super-linearly
  * for a reason the REAL corpus growth doesn't have. Instead each
  * replica r deterministically rewrites ~half the tokens (md5 of
  * (token, r) decides), which drives cross-replica shingle Jaccard to
  * ~0.1 — below every banding threshold — while keeping within-replica
  * duplicate structure identical to sf0.1. Vocabulary grows ~6x for
  * 10x data, Heaps-plausible. Embeddings rotate components per replica
  * (norm-preserving, direction-distinct), so cluster structure scales
  * rather than collapsing onto ten copies of the same centroids.
  *
  * Everything is md5-keyed — rebuilding the slice bit-identically on
  * any machine, the repo's determinism contract. */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.create("local[8]", 32)
    spark.sparkContext.setLogLevel("WARN")

    val reps = spark.range(0, 10).toDF("rep")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docs1 = docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * 10000000L)
      .withColumn("text", when(col("rep") === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "), w =>
          when(conv(substring(md5(concat(w,
              lit(":"), col("rep").cast("string"))), 1, 4), 16, 10)
              .cast("long") % 2 === 0,
            concat(w, lit("x"), col("rep").cast("string"))).otherwise(w)),
          " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep")
    docs1.repartition(8).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dim = emb.selectExpr("max(size(embedding))").first().getInt(0)
    val emb1 = emb.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("rep") * 10000000L)
      .withColumn("embedding",
        expr(s"transform(sequence(0, $dim - 1), " +
          "i -> embedding[CAST((i + rep) % " + dim + " AS INT)])")
          .cast("array<float>"))
      .drop("rep")
    emb1.repartition(4).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    // Relational side (round 9): scale the TPC-H facts AND their
    // per-SF dimensions 10x the way the spec itself scales them —
    // customer/supplier/part/orders/lineitem grow with SF, only
    // nation/region stay fixed. Each replica shifts every key by
    // rep*10^7 IN LOCKSTEP (orderkey with its lineitems, custkey with
    // its orders, part/supp refs with their lines), so every join
    // edge stays within one replica: per-key fan-outs are preserved
    // exactly and join output grows exactly 10x — replicating facts
    // against FIXED dimensions would instead grow per-key join groups
    // 10x, a shuffle profile real SF growth doesn't have. Dates,
    // flags and prices are untouched, so filter selectivities (q9's
    // p_name pattern, q21's F flag) hold per replica.
    val shift = lit(10000000L)
    def rep10(t: String, keys: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val scaled = keys.foldLeft(df.crossJoin(reps)) { (d, k) =>
        d.withColumn(k, col(k) + col("rep") * shift)
      }.drop("rep")
      scaled.repartition(8).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }
    rep10("customer", Seq("c_custkey"))
    rep10("supplier", Seq("s_suppkey"))
    rep10("part", Seq("p_partkey"))
    rep10("orders", Seq("o_orderkey", "o_custkey"))
    rep10("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    // events: more USERS over the same time window (shift user/event
    // ids, keep ts) — sessions-per-user and windows-per-user stay
    // fixed while user count grows, which is how event volume actually
    // scales; densifying the same users 10x would instead blow up the
    // per-user window state, a shape real growth doesn't have
    rep10("events", Seq("event_id", "user_id"))
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println(s"[makesf1] wrote $out: " +
      s"${spark.read.parquet(s"$out/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$out/embeddings.parquet").count()} vecs")
    spark.stop()
  }
}
