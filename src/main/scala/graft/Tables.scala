package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated star schema
  * (`TESTDATA.md`). All queries take the sf directory as a parameter so the
  * same code runs at any scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) column normalized: requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[Sessions]],
    * Verify and Bench), yielding `ts_ns: Long` plus a µs-truncated proper
    * timestamp `ts`. Oracle-side equivalents: `epoch_ns(ts)` and
    * `date_trunc('microseconds', ts)`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) layout under nanosAsLong
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType =>
        // timestamp[us] written without UTC adjustment reads as NTZ; the
        // generator's wall-clock IS the UTC instant and the session tz is
        // pinned UTC (Sessions), so the cast preserves the instant —
        // DuckDB's epoch_us/epoch_ns over the same file agree.
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }

  /** Register every table as a temp view (handy for spark.sql tests). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
