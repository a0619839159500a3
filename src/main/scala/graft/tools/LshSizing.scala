package graft.tools

import org.apache.spark.sql.functions._

/** Measures the sign-LSH sizing rule from Similarity.cosineNearDups'
  * scaladoc on the sf1 slice: at fixed rowsPerBand candidates grow
  * ~n^2/2^r, so raising r with log(n) (and bands for recall) should
  * hold runtime near-linear. Prints per-config: elapsed, candidate
  * volume proxy (confirmed pairs), planted-copy recall. */
object LshSizing {
  def main(args: Array[String]): Unit = {
    val sf = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.where(col("vec_id") < 50)
      .select((col("vec_id") + 90000000L).as("vec_id"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float"))
          .as("embedding"))
    val corpus = emb.unionByName(planted)
    for ((bands, r) <- Seq((8, 8), (8, 12), (16, 12), (16, 16))) {
      val t0 = System.nanoTime()
      val pairs = graft.ops.Similarity.cosineNearDups(corpus, "vec_id",
        "embedding", threshold = 0.9, bands = bands, rowsPerBand = r)
      val n = pairs.count()
      val plantedFound = pairs
        .where(col("id_b") >= 90000000L && col("id_a") < 90000000L).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[lshsizing] bands=$bands%2d rows=$r%2d " +
        f"elapsed=$dt%6.2fs pairs=$n%6d plantedRecall=${plantedFound}/50")
    }
    spark.stop()
  }
}
