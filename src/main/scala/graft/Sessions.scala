package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for all graft entry points.
  *
  * These settings are scale-oriented defaults: AQE on (runtime
  * re-planning, skew-join splitting, partition coalescing — the knobs
  * that keep a 100 TB shuffle healthy), UTC session time, and the legacy
  * nanos-as-long parquet reader for the `events` table's TIMESTAMP(NANOS)
  * column (Spark has no nanosecond timestamp type).
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
}
