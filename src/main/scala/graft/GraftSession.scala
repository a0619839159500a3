package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-tuned defaults this engine assumes.
  * One place to encode the 100 TB posture: AQE on (runtime re-planning,
  * partition coalescing, skew-join splitting), shuffle partitions sized
  * to the machine (not Spark's legacy 200), bounded scan partitions, UTC,
  * and the nanos-parquet compatibility flag the fixtures need. */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // big-big shuffle joins with a selective side: build a bloom filter
      // from the filtered side and drop fact rows BEFORE the shuffle
      // (ScaleOpsSpec pins the rewrite; thresholds stay Spark's defaults,
      // sized for real clusters rather than the test fixtures)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Build + register the engine's custom Catalyst functions. */
  def create(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession =
    Graft.init(builder(master, shufflePartitions).getOrCreate())
}
