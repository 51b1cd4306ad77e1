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
}
