package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine has no streaming at all (SURVEY.md §2.5); this is
  * extension surface. Each transform works identically on a batch
  * DataFrame and a streaming one (`spark.readStream`) — the watermark is a
  * no-op in batch — so the batch correctness oracle covers the streaming
  * logic, and the streaming path is exercised with MemoryStream in tests.
  *
  * Scale notes: windowed aggregation shuffles on (window, key) with
  * partial aggregation map-side; the watermark bounds state so a
  * 1000-executor streaming job doesn't accumulate unbounded window state.
  */
object StreamOps {

  /** Tumbling-window counts+sums per event_type with late-data cutoff. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user keyed by inactivity gap. */
  def sessionized(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
}
