package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: natural collision structure of the documents
  * fixture — simhash hamming histogram over all pairs, and which doc ids
  * participate in near-collisions. Used to pick planted-oracle parameters
  * for q_minhash_lsh / q_simhash_pairs (guarantee: the planted pairs are
  * the ONLY qualifying output rows). */
object FixtureStats {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = docs.select(col("doc_id").cast("long").as("id"),
      graft.functions.TextExprs.simhash64(
        graft.ops.TextOps.words(col("text"))).as("sim"))
      .persist()
    val pairs = sh.as("a").crossJoin(sh.as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .where(col("hamming") <= 6)
      .persist()
    println("== hamming histogram (<=6) ==")
    pairs.groupBy("hamming").count().orderBy("hamming").collect()
      .foreach(r => println(s"hamming=${r.get(0)} n=${r.get(1)}"))
    println("== pairs with hamming <= 3 ==")
    pairs.where(col("hamming") <= 3).orderBy("id_a", "id_b").collect()
      .foreach(r => println(s"  ${r.get(0)} ${r.get(1)} h=${r.get(2)}"))
    spark.stop()
  }
}
