package graft.tools
import org.apache.spark.sql.functions._
object ProbePhases {
  def main(args: Array[String]): Unit = {
    val sf = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.create("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)
    import spark.implicits._
    val d = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"), col("text"))
    val corpus = d.where(col("doc_id") >= 20)
    val batch = d.where(col("doc_id") < 20).localCheckpoint(true)
    val tmp = java.nio.file.Files.createTempDirectory("probephases").toString
    graft.ops.Dedup.saveGramIndex(corpus, tmp, "text", 8, 64)
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $l%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r }
    (1 to 3).foreach { i =>
      println(s"[phase] --- iter $i ---")
      val anchors = time("batchAnchorTable")(graft.ops.Dedup.batchAnchorTable(batch, "doc_id", "text", 8))
      val reparted = anchors.repartition(col("h"))
      val bg = reparted.select(col("h")).distinct()
      val counts = time("bucket collect")(bg.groupBy(pmod(col("h"), lit(64L)).as("b")).agg(count(lit(1)).as("n")).collect())
      println(s"[phase] buckets=${counts.length} grams=${counts.map(_.getLong(1)).sum}")
      time("full excise main job")(graft.ops.Dedup.exciseAgainstIndexAnchored(batch, anchors, tmp, "doc_id", "text", 8).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
