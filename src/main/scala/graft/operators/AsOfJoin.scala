package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (point-in-time) join: for each left row, the single right row
  * with the greatest right-time <= left-time within the same key — the
  * temporal join training pipelines use to attach "state as of event
  * time" features.
  *
  * Implementation is the UNION-AND-SWEEP pattern, not a per-key
  * nested-loop: tag both inputs, union them, and sweep one window
  * ordered by (key, time) carrying the last-seen right row forward
  * (`last_value(ignoreNulls)`). Cost is one shuffle + sort over
  * |L| + |R| — linear, partitioned by key, no quadratic per-key
  * candidate join — which is what survives a 100 TB fact table. Ties on
  * right-time are resolved by the greatest tiebreaker column.
  */
object AsOfJoin {

  /** Left rows (`leftTime` epoch-µs) pick up the latest right row
    * (`rightTime` epoch-µs <= leftTime) with `rightKey` = `leftKey`.
    * Right payload columns come back null when no right row precedes
    * the left row. Left/right column name sets must be disjoint.
    */
  def asOf(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTime: Column, rightTime: Column, rightPayload: Seq[String],
      rightTiebreak: Column): DataFrame = {
    val l = left.withColumn("__t", leftTime).withColumn("__side", lit(1))
      .withColumn("__tb", lit(Long.MaxValue))
    val lAligned = rightPayload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = right.withColumn("__t", rightTime).withColumn("__side", lit(0))
      .withColumn("__tb", rightTiebreak)
    val rAligned = left.columns.foldLeft(r)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select(
      (left.columns.map(col).toSeq ++ rightPayload.map(col) ++
        Seq(col(leftKey).as("__k"), col("__t"), col("__side"), col("__tb"))): _*)
      .unionByName(rAligned.select(
        (left.columns.map(col).toSeq ++ rightPayload.map(col) ++
          Seq(col(rightKey).as("__k"), col("__t"), col("__side"), col("__tb"))): _*))
    // rights sort before lefts at equal time (__side 0 < 1), and later
    // tiebreak wins among equal right times
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // sweep ONE struct of all payload columns, not each independently:
    // a right row with a genuinely-NULL payload field must carry that
    // null forward as a unit — per-column ignoreNulls sweeps would mix
    // fields from different right rows into one that never existed
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val swept = unioned
      .withColumn("__p",
        when(col("__side") === 0, payloadStruct).otherwise(lit(null).cast(payloadType)))
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    swept.filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++ rightPayload.map(c => col(s"__p.$c").as(c)): _*)
  }

  /** events as-of-joined to the customer's latest preceding order. */
  def eventsAsOfOrders(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    // one order per (custkey, orderdate): greatest orderkey wins, so the
    // as-of tie is deterministic in both engines
    val orders = Upsert.latestPerKeyAgg(
        Tables.load(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("o_us")),
        Seq("o_custkey", "o_us"), col("o_orderkey"))
    asOf(ev, orders, leftKey = "user_id", rightKey = "o_custkey",
      leftTime = col("ts_us"),
      rightTime = col("o_us"),
      rightPayload = Seq("o_orderkey", "o_totalprice"),
      rightTiebreak = col("o_orderkey"))
  }

  val eventsAsOfOrdersSql: String =
    """WITH ev AS (
         SELECT event_id, user_id, event_type, epoch_us(ts)::BIGINT AS ts_us FROM events),
       o AS (
         SELECT o_custkey AS user_id, epoch_us(o_orderdate)::BIGINT AS o_us,
                max(o_orderkey) AS o_orderkey,
                max_by(o_totalprice, o_orderkey) AS o_totalprice
         FROM orders GROUP BY 1, 2)
       SELECT ev.event_id, ev.user_id, ev.event_type, ev.ts_us,
              o.o_orderkey, o.o_totalprice
       FROM ev ASOF LEFT JOIN o
         ON ev.user_id = o.user_id AND ev.ts_us >= o.o_us"""
}
