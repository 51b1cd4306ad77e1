package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Avro value serde (O17's pluggable-Serde contract under the
  * production-typical Kafka binding): encode → decode round-trips
  * payloads bit-exactly under the derived writer schema, nullable
  * fields travel as Avro unions, and the reserved-metadata-name
  * rejection matches the JSON path's.
  */
class AvroSerdeSpec extends SparkSpec {
  import spark.implicits._

  // offset must be DETERMINISTIC across plan re-evaluations (it feeds
  // the join core's tie-break order); a hash of the encoded value is,
  // monotonically_increasing_id is not
  private def kafkaShaped(encoded: org.apache.spark.sql.DataFrame,
      ts: String = "2024-01-01 00:10:00") =
    encoded.select(col("key"), col("value"),
      lit(java.sql.Timestamp.valueOf(ts)).as("timestamp"),
      xxhash64(col("value")).as("offset"))

  test("Avro encode → decode round-trips the events payload bit-exactly") {
    val rows = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .limit(500)
    val decoded = KafkaWiring.decodeAvro(
      kafkaShaped(KafkaWiring.encodeAvro(rows, col("event_id"),
        rows.columns.map(col).toSeq)),
      rows.schema)
    val got = decoded
      .select(col("record_key"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
      .as[(String, Long, Long, String, Double)].collect().toSeq.sorted
    val expect = rows.as[(Long, Long, String, Double)].collect().toSeq
      .map(r => (r._1.toString, r._1, r._2, r._3, r._4)).sorted
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("nullable fields round-trip as Avro unions; nested structs encode") {
    val rows = Seq(
      (1L, Some("a"), Some(2L)),
      (2L, None, Some(3L)),
      (3L, Some("c"), None))
      .toDF("id", "name", "ref")
      // the output-topic shape: a nested struct value, like the joined
      // {comment, story} record
      .select(col("id"), struct(col("name"), col("ref")).as("payload"))
    val decoded = KafkaWiring.decodeAvro(
      kafkaShaped(KafkaWiring.encodeAvro(rows, col("id"),
        Seq(col("id"), col("payload")))),
      rows.schema)
    val got = decoded.select(col("id"), col("payload.name"), col("payload.ref"))
      .as[(Long, Option[String], Option[Long])].collect().toSet
    assert(got == Set((1L, Some("a"), Some(2L)), (2L, None, Some(3L)),
      (3L, Some("c"), None)))
  }

  test("reserved metadata names are rejected, matching the JSON path") {
    val schema = Seq((1L, "x")).toDF("seq", "text").schema
    val err = intercept[IllegalArgumentException] {
      KafkaWiring.decodeAvro(
        kafkaShaped(Seq(("k", Array.empty[Byte])).toDF("key", "value")), schema)
    }
    assert(err.getMessage.contains("seq"))
  }

  test("corrupt Avro bytes fail loudly — the typed contract, not from_json's null-fill") {
    val rows = Seq((1L, "a")).toDF("id", "name")
    val schema = rows.schema
    // valid wire bytes decode; the same stream truncated mid-datum throws
    val good = KafkaWiring.decodeAvro(
      kafkaShaped(KafkaWiring.encodeAvro(rows, col("id"),
        Seq(col("id"), col("name")))), schema)
    assert(good.select(col("name")).as[String].collect().toSeq == Seq("a"))
    val corrupt = KafkaWiring.decodeAvro(
      kafkaShaped(KafkaWiring.encodeAvro(rows, col("id"),
        Seq(col("id"), col("name")))
        .select(col("key"), expr("substring(value, 1, 1)").as("value"))), schema)
    val e = intercept[Exception] { corrupt.collect() }
    // any decode-layer failure is acceptable; silently returning rows is not
    assert(e != null)
  }

  test("both ValueSerde bindings round-trip the same payload through the trait surface") {
    val rows = Seq((1L, "a", Some(2.5)), (2L, "b", None))
      .toDF("id", "name", "score")
    for (serde <- Seq[ValueSerde](JsonValueSerde, AvroValueSerde)) {
      val decoded = serde.decode(
        kafkaShaped(serde.encode(rows, col("id"), rows.columns.map(col).toSeq)),
        rows.schema)
      // identical record-shape contract regardless of wire format
      assert(decoded.columns.take(3).toSeq == Seq("record_key", "seq", "tie"))
      val got = decoded.select(col("id"), col("name"), col("score"))
        .as[(Long, String, Option[Double])].collect().toSet
      assert(got == Set((1L, "a", Some(2.5)), (2L, "b", None)), s"serde=$serde")
    }
  }

  test("q103 (denorm over Avro roundtrip) equals q01 (plain denorm) row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q103_avro_denorm")(spark, dir)
    val plain = graft.SparkEntry.queries("q01_denorm_inner")(spark, dir)
    assert(got.schema == plain.schema)
    val key = got.columns.map(col).toSeq
    assert(got.sort(key: _*).collect().toSeq ==
      plain.sort(key: _*).collect().toSeq)
    assert(got.count() > 0)
  }

  test("the full denormalization core runs over Avro-decoded inputs unchanged") {
    // the serde is upstream of the join contract: the identical
    // indexStream → joined chain the JSON golden-fixture test runs,
    // fed by Avro-decoded frames instead
    val left = Seq((10L, 1L, "left-a"), (11L, 1L, "left-b"))
      .toDF("id", "fk", "payload")
    val right = Seq((1L, "right-1")).toDF("id", "payload")
    val leftDec = KafkaWiring.decodeAvro(
      kafkaShaped(KafkaWiring.encodeAvro(left, col("id"),
        left.columns.map(col).toSeq)), left.schema)
    // the dimension arrives BEFORE the facts (distinct record
    // timestamps — the normal topology shape; a single catch-up batch
    // with interleaved ties is the documented strictBatchDedup=false
    // territory, not this test's subject)
    val rightDec = KafkaWiring.decodeAvro(
      kafkaShaped(KafkaWiring.encodeAvro(right, col("id"),
        right.columns.map(col).toSeq), ts = "2024-01-01 00:00:00"), right.schema)
    val index = StreamDenormalize.indexStream(
      leftDec, col("id"), col("fk"), col("seq"),
      rightDec, col("id"), col("seq"),
      leftTie = col("tie"), rightTie = col("tie"))
    val joined = StreamDenormalize.joined(index, "inner")
    assert(joined.collect().map(_.outKey).toSet == Set("10", "11"))
  }
}
