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
    // (-1, -1) = the round-9 self-sizing path (rowsPerBand = -1):
    // autoGranularity derives (r, bands) from one corpus count — the
    // row that proves the measured rule now applies itself
    for ((bands, r) <- Seq((8, 8), (8, 12), (16, 12), (16, 16), (-1, -1))) {
      val auto = r == -1
      val t0 = System.nanoTime()
      val pairs =
        if (auto) graft.ops.Similarity.cosineNearDups(corpus, "vec_id",
          "embedding", threshold = 0.9, rowsPerBand = -1)
        else graft.ops.Similarity.cosineNearDups(corpus, "vec_id",
          "embedding", threshold = 0.9, bands = bands, rowsPerBand = r)
      val n = pairs.count()
      val plantedFound = pairs
        .where(col("id_b") >= 90000000L && col("id_a") < 90000000L).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val label = if (auto) "auto(r=-1)  " else f"bands=$bands%2d rows=$r%2d"
      println(f"[lshsizing] $label " +
        f"elapsed=$dt%6.2fs pairs=$n%6d plantedRecall=${plantedFound}/50")
    }
    spark.stop()
  }
}
