package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming aggregation: watermarked tumbling windows in
  * append mode — the operator class the reference lacks entirely
  * (SURVEY.md §2 "deliberately absent": watermarks/event-time windows).
  *
  * Append-mode semantics: a window row is emitted exactly once, when the
  * watermark (max observed event time minus `delay`) passes the window
  * end; later-arriving data for an emitted window is dropped. State is
  * hash-partitioned by (window, keys) — the same partitioning-by-
  * grouping-key discipline as the denormalization core.
  */
object StreamAggregates {

  /** Tumbling event-time aggregate over a streaming DataFrame with
    * columns `ts: timestamp`, `event_type: string`, `value: double`.
    */
  def windowedEventStats(events: DataFrame, windowLen: String = "1 hour",
      delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming SESSION windows: gap-merged per-user sessions finalized
    * by the watermark — the stateful-merge variant (session extents
    * grow and merge as events arrive, unlike fixed tumbling frames).
    * Input columns `ts: timestamp`, `user_id: long`, `value: double`.
    */
  def sessionizedEventStats(events: DataFrame, gap: String = "30 minutes",
      delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("sum_value"))
}
