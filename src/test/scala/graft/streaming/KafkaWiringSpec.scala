package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka shaping transforms are pure DataFrame ops, so they are
  * fully testable without a broker: decode consumes exactly the column
  * layout the Kafka source emits (binary key/value, timestamp, offset),
  * encode produces exactly the layout the Kafka sink requires (binary
  * key/value). Only the `format("kafka")` endpoints are cluster-gated.
  */
class KafkaWiringSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("story", LongType),
    StructField("text", StringType)))

  private def kafkaShaped = Seq(
    ("41", """{"id":41,"story":7,"text":"hi","extra":"ignored"}""",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1048575L),
    ("42", """{"id":42,"story":7}""",
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1048576L))
    .toDF("k", "v", "timestamp", "offset")
    .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"),
      col("timestamp"), col("offset"))

  test("decode: JsonSerde semantics (unknown fields ignored, missing → null) + (seq, tie)") {
    val out = KafkaWiring.decode(kafkaShaped, schema)
      .orderBy("tie").collect()
    assert(out.map(_.getAs[String]("record_key")).toSeq == Seq("41", "42"))
    assert(out(0).getAs[Long]("id") == 41L && out(0).getAs[String]("text") == "hi")
    assert(out(1).isNullAt(out(1).fieldIndex("text"))) // missing field → null
    // same-millisecond records: seq ties, tie (the raw offset) preserves
    // per-partition order — including across the 2^20 offset boundary
    assert(out(0).getAs[Long]("seq") == out(1).getAs[Long]("seq"))
    assert(out(0).getAs[Long]("tie") == 1048575L && out(1).getAs[Long]("tie") == 1048576L)
  }

  test("decode rejects payload schemas that declare reserved metadata columns") {
    val clashing = StructType(Seq(
      StructField("id", LongType), StructField("seq", LongType),
      StructField("tie", LongType)))
    val e = intercept[IllegalArgumentException](KafkaWiring.decode(kafkaShaped, clashing))
    assert(e.getMessage.contains("seq") && e.getMessage.contains("tie"))
  }

  test("encode → decode roundtrip is lossless for the declared fields") {
    val rows = Seq((7L, 70L, "body")).toDF("id", "story", "text")
    val encoded = KafkaWiring.encode(rows, col("id"),
      Seq(col("id"), col("story"), col("text")))
    assert(encoded.columns.toSeq == Seq("key", "value")) // the sink contract
    val back = KafkaWiring.decode(
      encoded.withColumn("timestamp", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .withColumn("offset", lit(0L)),
      schema).collect().head
    assert(back.getAs[String]("record_key") == "7")
    assert(back.getAs[Long]("id") == 7L)
    assert(back.getAs[Long]("story") == 70L)
    assert(back.getAs[String]("text") == "body")
  }
}
