package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
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
    val threshold = 0.3

    val sets = docs.select(col("doc_id").cast("long").as("id"),
      TextOps.shingleSet(col("text"), 3).as("sh")).persist()
    time("sets persist")(sets.count())
    val toks = sets.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("tok0"))
      .select(col("id"), col("sz"), xxhash64(col("tok0")).as("tok"))

    val full = toks.as("a").join(toks.as("b"), Seq("tok"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct()
    time("full-index candidates")(println("cand_full=" + full.count()))

    val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val prefix = toks.join(df, Seq("tok"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("id").orderBy(col("df"), col("tok"))))
      .where(col("pos") <= col("sz") - ceil(col("sz") * lit(threshold)) + 1)
      .select(col("id"), col("tok")).persist()
    time("prefix build")(println("prefix_toks=" + prefix.count()))
    val cand = prefix.as("a").join(prefix.as("b"), Seq("tok"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id")).distinct()
    time("prefix candidates")(println("cand_prefix=" + cand.count()))

    time("jaccardPairs full")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, threshold)
        .queryExecution.toRdd.count())
    time("minhashNearDups full")(
      Dedup.minhashNearDups(docs, "doc_id", "text").queryExecution.toRdd.count())
    spark.stop()
  }
}
