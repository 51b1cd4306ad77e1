package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-value-per-key snapshot — the batch analog of the reference's
  * compacted index topic + KTable materialization (SURVEY.md §2 O8;
  * `dsl/StreamDenormalize.java:67-70`, compaction
  * `infra/docker-compose.yaml:44`): Kafka log compaction keeps the latest
  * record per key, so the join always sees the newest version of each row.
  *
  * Implementation: `row_number()` over a window partitioned by the key,
  * ordered by the version columns descending — one shuffle on the key,
  * map-side nothing to combine (row_number needs full rows). At 100 TB the
  * alternative `groupBy(key).agg(max_by(struct(*), version))` does partial
  * aggregation map-side and is cheaper when the duplication factor is
  * high; we expose both and default to max_by.
  */
object Upsert {

  /** Keep the single latest row per key. `versionOrder` are columns whose
    * DESCENDING order defines "latest" (ties broken by adding more
    * columns; callers should make the total order unique for determinism).
    */
  def latestPerKey(df: DataFrame, keys: Seq[Column], versionOrder: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(versionOrder.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregation-based variant: map-side partial combine makes this the
    * 100 TB choice when many versions per key exist. Output column order
    * is preserved. `versionOrder` must be a single orderable column here
    * (compose a struct for multi-column versions).
    */
  def latestPerKeyAgg(df: DataFrame, keys: Seq[String], version: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, version).as("__row"))
      .select(df.columns.map(c => col(s"__row.$c")).toSeq: _*)
  }

  /** Compacted-topic semantics WITH delete markers — Kafka
    * `cleanup.policy=compact`'s other half: a tombstone (null-payload
    * record) DELETES its key at compaction. The reference's topics
    * declare `compact,delete` but delegate deletion entirely to the
    * broker; this is the engine-side equivalent so a snapshot read
    * honors deletes without waiting for log cleaning: latest record
    * per key wins (same map-side-combining max_by as
    * [[latestPerKeyAgg]]), and a key whose LATEST record is a
    * tombstone is absent from the snapshot. Order matters: the filter
    * runs AFTER the argmax — a tombstone must suppress older live
    * versions (filtering tombstones first would resurrect them).
    */
  def latestPerKeyTombstone(df: DataFrame, keys: Seq[String], version: Column,
      isTomb: Column): DataFrame = {
    val withT = df.withColumn("__tomb", isTomb)
    val payload = struct(withT.columns.map(col).toSeq: _*)
    withT.groupBy(keys.map(col): _*)
      .agg(max_by(payload, version).as("__row"))
      .filter(!col("__row.__tomb"))
      .select(df.columns.map(c => col(s"__row.$c")).toSeq: _*)
  }

  /** Ingestion-style seen-set dedup (SURVEY.md §2 O21,
    * `services/comments.py:18,52-53`): first occurrence per id wins.
    * "First" is defined by ascending `arrivalOrder` for determinism.
    */
  def firstSeen(df: DataFrame, keys: Seq[Column], arrivalOrder: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(arrivalOrder.map(_.asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Aggregation-based first-seen (min_by): map-side partial combine —
    * the mirror of [[latestPerKeyAgg]] for the seen-set semantics.
    */
  def firstSeenAgg(df: DataFrame, keys: Seq[String], arrival: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(min_by(payload, arrival).as("__row"))
      .select(df.columns.map(c => col(s"__row.$c")).toSeq: _*)
  }
}
