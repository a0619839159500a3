package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** Scratch profiler for the similarity-join pipeline stages. */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()

    val sets = docs.select(col("doc_id").cast("long").as("id"),
      TextOps.shingleSet(col("text"), 3).as("sh"))
    time("shingleSet")(sets.queryExecution.toRdd.count())
    time("shingleSet x2")(sets.queryExecution.toRdd.count())

    val sig = sets.withColumn("sig", Dedup.minhashSig(col("sh"), 64))
    time("minhashSig(transform)")(sig.queryExecution.toRdd.count())

    val toks = sets.select(col("id"), explode(col("sh")).as("tok"))
    val sig2 = toks.groupBy("id").agg(
      array((0 until 64).map(i => min(xxhash64(lit(i), col("tok")))): _*).as("sig"))
    time("minhashSig(explode+agg)")(sig2.queryExecution.toRdd.count())

    val toks2 = sets.select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("tok"))
    val pairs = toks2.as("a").join(toks2.as("b"), Seq("tok"))
      .where(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
      .agg(count(lit(1)).as("inter"))
    time("jaccard pair-gen+agg")(println("pairs=" + pairs.count()))

    time("jaccardPairs full")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.3).queryExecution.toRdd.count())

    // minhash pipeline stage-by-stage
    val setsP = sets.persist()
    time("sets persist")(setsP.count())
    val sigP = setsP.withColumn("sig", Dedup.minhashSig(col("sh"), 64))
    time("sig over cached sets")(sigP.queryExecution.toRdd.count())
    val bucketsP = setsP.select(col("id"),
      explode(Dedup.bandKeys(Dedup.minhashSig(col("sh"), 64), 16, 4)).as("bucket"))
    time("buckets")(println("buckets=" + bucketsP.count()))
    val candP = bucketsP.as("a").join(bucketsP.as("b"), Seq("bucket"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("candidates")(println("cand=" + candP.count()))
    time("minhashNearDups full")(
      Dedup.minhashNearDups(docs, "doc_id", "text").queryExecution.toRdd.count())
    spark.stop()
  }
}
