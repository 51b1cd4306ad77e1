package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Live-broker round-trip for the connector-gated [[KafkaWiring]]
  * endpoints — the one reference code path (`format("kafka")` itself)
  * the offline sandbox can never execute (no broker, and the
  * spark-sql-kafka connector jar is absent from every offline source;
  * see KafkaWiring's scaladoc).
  *
  * Gated on `GRAFT_KAFKA_BOOTSTRAP`: unset (the sandbox case) the
  * tests CANCEL via `assume` — reported as canceled, not passed, so a
  * green offline run cannot be mistaken for connector coverage. On a
  * real cluster, point the variable at a reachable broker
  * (`host:9092`) with auto-topic-creation (or pre-created
  * `graft_it_*` topics) and the suite closes the loop the file-source
  * analogs (q08/q50/q72) prove everywhere else: encode → topic →
  * decode is payload-lossless, and the decoded stream drives the same
  * stateful join core to the relational result.
  */
class KafkaIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
  // one run's topics are unique, so reruns never see stale records
  private def freshTopic(tag: String): String =
    s"graft_it_${tag}_${System.currentTimeMillis()}"

  test("encode → topic → decode round-trips payloads bit-exactly (live broker)") {
    assume(bootstrap.isDefined,
      "GRAFT_KAFKA_BOOTSTRAP not set — live Kafka round-trip skipped")
    val bs = bootstrap.get
    val topic = freshTopic("serde")
    val rows = Seq(
      (1L, 10L, "purchase", 1.5),
      (2L, 20L, "view", 0.0),
      (3L, 10L, "error", -2.25))
      .toDF("event_id", "user_id", "event_type", "value")
    KafkaWiring.encode(rows, col("event_id"), rows.columns.map(col).toSeq)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("topic", topic)
      .save()
    val back = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    val decoded = KafkaWiring.decode(back, rows.schema)
    // payloads round-trip as a multiset; record_key carries the encode key
    val got = decoded
      .select(col("record_key"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      .as[(String, Long, Long, String, Double)].collect().toSeq.sorted
    val expect = rows.as[(Long, Long, String, Double)].collect().toSeq
      .map(r => (r._1.toString, r._1, r._2, r._3, r._4)).sorted
    assert(got == expect)
  }

  test("two topics → decode → FK join converges to the relational join (live broker)") {
    assume(bootstrap.isDefined,
      "GRAFT_KAFKA_BOOTSTRAP not set — live Kafka join round-trip skipped")
    val bs = bootstrap.get
    val leftTopic = freshTopic("left")
    val rightTopic = freshTopic("right")
    val lefts = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 10L, "c"))
      .toDF("event_id", "user_id", "payload")
    val rights = Seq((10L, "alice"), (20L, "bob"), (30L, "carol"))
      .toDF("c_custkey", "c_name")
    def publish(df: org.apache.spark.sql.DataFrame, key: String, topic: String): Unit =
      KafkaWiring.encode(df, col(key), df.columns.map(col).toSeq)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bs)
        .option("topic", topic)
        .save()
    publish(lefts, "event_id", leftTopic)
    publish(rights, "c_custkey", rightTopic)
    def consume(topic: String, schema: org.apache.spark.sql.types.StructType) =
      KafkaWiring.decode(
        spark.read.format("kafka")
          .option("kafka.bootstrap.servers", bs)
          .option("subscribe", topic)
          .option("startingOffsets", "earliest")
          .load(),
        schema)
    val l = consume(leftTopic, lefts.schema)
    val r = consume(rightTopic, rights.schema)
    // the same core the file-source queries drive, in batch mode (the
    // join algorithm is input-agnostic); rights sort first via seq=0
    val idx = StreamDenormalize.indexStream(
      l.select(col("event_id"), col("user_id"), col("payload")),
      col("event_id"), col("user_id"), lit(1L),
      r.select(col("c_custkey"), col("c_name")),
      col("c_custkey"), lit(0L))
    val joined = StreamDenormalize.parsed(
      StreamDenormalize.joined(idx, "inner"),
      l.select(col("event_id"), col("user_id"), col("payload")).schema,
      r.select(col("c_custkey"), col("c_name")).schema)
      .select(col("left.event_id"), col("left.user_id"), col("right.c_name"))
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(joined == Seq((1L, 10L, "alice"), (2L, 20L, "bob"), (3L, 10L, "alice")))
  }
}
