package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures the grouped bottom-k exchange fix (round 10): the previous
  * `Kmv.sketchBy` shipped the full distinct (group, hash) stream
  * through its level-1 salted-window exchange; the bottom-k
  * `TypedImperativeAggregate` collapses each task's slice of a group
  * to ≤ k hashes BEFORE the shuffle — the same volume argument as the
  * global sketch's per-partition TreeSet fix (13.7 → 6.1 s at 50M
  * keys). This probe runs both shapes on the same synthetic stream of
  * N distinct (group, key) pairs and reports elapsed seconds AND total
  * shuffle-write bytes (task-metric sum — the exchange volume itself,
  * not a proxy).
  *
  * Usage: KmvGroupedProbe [N] [groups] [k]   (defaults 50M, 1000, 128)
  */
object KmvGroupedProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000000L
    val groups = if (args.length > 1) args(1).toLong else 1000L
    val k = if (args.length > 2) args(2).toInt else 128
    val spark = graft.GraftSession.create("local[8]", 8)
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.init(spark)

    // every key distinct -> the worst case for the old shape: the
    // distinct (group, hash) stream is the whole input
    def input: DataFrame = spark.range(n)
      .select((col("id") % groups).as("g"),
        graft.ops.Kmv.hash60(col("id")).as("h"))

    // the REPLACED shape, inlined for comparison: distinct + two-level
    // salted rank (level 1 exchange carries every distinct pair)
    def oldShape: DataFrame = {
      import org.apache.spark.sql.expressions.Window
      input.distinct()
        .withColumn("_rn", row_number().over(Window
          .partitionBy(col("g"), col("h").bitwiseAND(lit(4095L)))
          .orderBy(col("h"))))
        .where(col("_rn") <= k)
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("h"))))
        .where(col("_rn") <= k)
        .select(col("g"), col("h"))
    }

    // the round-10 shape: partial-aggregating bottom-k
    def newShape: DataFrame = input
      .groupBy(col("g"))
      .agg(graft.functions.SketchExprs.bottomK(col("h"), k).as("_hs"))
      .select(col("g"), explode(col("_hs")).as("h"))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(
          m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def run(label: String, df: => DataFrame): Long = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val cnt = df.agg(count(lit(1)),
        sum(col("h").bitwiseAND(lit(0xFFFFL)))).collect()(0).getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain the task-end events
      val mb = shuffleBytes.get() / 1e6
      println(f"[kmvprobe] $label%-10s elapsed=$dt%7.2fs " +
        f"shuffleWrite=$mb%10.1f MB rows=$cnt")
      cnt
    }

    // warm the hash/codegen paths once at small n
    run("warmup", spark.range(100000)
      .select((col("id") % 10).as("g"),
        graft.ops.Kmv.hash60(col("id")).as("h"))
      .groupBy(col("g"))
      .agg(graft.functions.SketchExprs.bottomK(col("h"), k).as("_hs"))
      .select(col("g"), explode(col("_hs")).as("h")))
    val cNew = run("new-agg", newShape)
    val cOld = run("old-window", oldShape)
    require(cNew == cOld, s"shapes disagree: $cNew vs $cOld")
    spark.stop()
  }
}
