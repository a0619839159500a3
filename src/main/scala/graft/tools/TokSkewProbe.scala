package graft.tools

import org.apache.spark.sql.functions._

/** Skew evidence for the jaccardPairs tok exchange (VERDICT r15 #2):
  * the document-frequency distribution of the shingle hashes that key
  * the shared exchange in the large-corpus regime. Reports total
  * occurrences, distinct tokens, the max-df token's share and the
  * top-10 cumulative share — the "bounded max-key share" number that
  * says whether one reducer can drown. Usage: TokSkewProbe [sfDir] [n]. */
object TokSkewProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val n = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    import graft.functions.ShingleExprs.shingleHash64
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = docs
      .select(explode(shingleHash64(col("text"), n)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val top = df.orderBy(col("df").desc).limit(10).collect()
    val agg = df.agg(sum(col("df")).as("total"),
      count(lit(1)).as("distinct")).head()
    val total = agg.getLong(0).toDouble
    println(f"[tokskew] $sf shingleN=$n occurrences=${agg.getLong(0)} " +
      s"distinct=${agg.getLong(1)}")
    println(f"[tokskew] max df=${top.head.getLong(1)} " +
      f"share=${top.head.getLong(1) / total * 100}%.4f%%")
    println(f"[tokskew] top10 share=${top.map(_.getLong(1)).sum / total * 100}%.4f%%")
    spark.stop()
  }
}
