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

  /** Default horizons in MILLISECONDS — the single source of truth the
    * interval-string defaults below are built from, exposed so the
    * sentinel-staging harnesses (q31/q95) can ASSERT their sentinel
    * offset clears window/session end + watermark delay instead of
    * trusting independent literals to stay compatible.
    */
  val windowLenMs: Long = 3600L * 1000
  val sessionGapMs: Long = 30L * 60 * 1000
  val delayMs: Long = 3600L * 1000

  /** Tumbling event-time aggregate over a streaming DataFrame with
    * columns `ts: timestamp`, `event_type: string`, `value: double`.
    */
  def windowedEventStats(events: DataFrame,
      windowLen: String = s"$windowLenMs milliseconds",
      delay: String = s"$delayMs milliseconds"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermarked SLIDING-window per-user counts in APPEND mode — the
    * EVICTING production form of the Complete-mode trending grid
    * (q123): each (window, user) row emits ONCE when the watermark
    * passes the window end, and its state is dropped — state holds
    * only the open windows instead of the full history. Delay is a
    * parameter (q124 uses 30 min) so the sentinel offset can clear
    * `2 h window + delay` under the shared 3 h sentinel constant.
    */
  def slidingUserCounts(events: DataFrame,
      windowLen: String = "2 hours", slide: String = "1 hour",
      delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowLen, slide), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH").as("win_start"),
        col("user_id"), col("cnt"))

  /** The q124 sentinel horizon: window length + watermark delay. */
  val slidingClearMs: Long = 2L * 3600 * 1000 + 30L * 60 * 1000

  /** Stream-stream INTERVAL join: purchases matched to error events of
    * the same user within the preceding `window` — the two-sided
    * stateful join the reference cannot express (its store holds one
    * table side; here BOTH sides buffer in watermarked state). Inner
    * joins emit on match arrival regardless of watermark; the
    * watermark + time-range condition exist to BOUND the state — each
    * side retains only rows within the interval of the other's
    * watermark, which is what makes an unbounded two-stream join
    * runnable at all. Inputs are two streaming frames with
    * `event_id, user_id, ts, event_type` columns.
    */
  def purchaseErrorJoin(purchases: DataFrame, errors: DataFrame,
      window: String = "1 hour", delay: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", delay)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val e = errors.filter(col("event_type") === "error")
      .withWatermark("ts", delay)
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") - expr(s"INTERVAL $window") &&
          col("e_ts") <= col("p_ts"),
        joinType)
      .select(col("purchase_id"), col("error_id"), col("user_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        unix_micros(col("e_ts")).as("error_us"))
  }

  /** The q129 sentinel horizon for the OUTER form of
    * [[purchaseErrorJoin]]: a buffered left row can only be declared
    * match-less once the right watermark clears its whole interval —
    * join window + watermark delay.
    */
  val intervalJoinClearMs: Long = 2L * 3600 * 1000

  /** Streaming SESSION windows: gap-merged per-user sessions finalized
    * by the watermark — the stateful-merge variant (session extents
    * grow and merge as events arrive, unlike fixed tumbling frames).
    * Input columns `ts: timestamp`, `user_id: long`, `value: double`.
    */
  def sessionizedEventStats(events: DataFrame,
      gap: String = s"$sessionGapMs milliseconds",
      delay: String = s"$delayMs milliseconds"): DataFrame =
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
