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

  test("denormalizeCore is serde-agnostic: Json and Avro bindings converge to the same join") {
    // the q115 claim in miniature, across BOTH serde bindings, in batch
    // mode (the core is a Dataset transform — batch execution exercises
    // the same decode → index → join → encode chain)
    // nullable-ized schemas: the core's from_json/parsed leg emits
    // all-nullable payload structs, so the declared schemas must agree
    // (toDF of Scala primitives would declare non-null longs and the
    // Avro reader schema would diverge from the writer's unions)
    def asNullable(st: StructType): StructType =
      StructType(st.fields.map(_.copy(nullable = true)))
    val lefts0 = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 20L, "c"))
      .toDF("id", "fk", "payload")
    val rights0 = Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty"))
      .toDF("rk", "name")
    val lefts = spark.createDataFrame(lefts0.rdd, asNullable(lefts0.schema))
    val rights = spark.createDataFrame(rights0.rdd, asNullable(rights0.schema))
    def shaped(df: org.apache.spark.sql.DataFrame, key: String, ts: String,
        serde: ValueSerde) =
      serde.encode(df, col(key), df.columns.map(col).toSeq)
        .select(col("key"), col("value"),
          lit(java.sql.Timestamp.valueOf(ts)).as("timestamp"),
          xxhash64(col("value")).as("offset"))
    def run(serde: ValueSerde): Set[(Long, Long, String, Long, String)] = {
      val out = KafkaWiring.denormalizeCore(
        shaped(lefts, "id", "2024-06-01 00:00:00", serde),
        shaped(rights, "rk", "2024-01-01 00:00:00", serde),
        lefts.schema, rights.schema,
        col("id"), col("fk"), col("rk"), "inner", strictBatchDedup = true, serde)
      val valueSchema = StructType(Seq(
        StructField("left", lefts.schema), StructField("right", rights.schema)))
      val reshaped = out.select(col("key"), col("value"),
        lit(java.sql.Timestamp.valueOf("2024-06-01 00:00:00")).as("timestamp"),
        lit(0L).as("offset"))
      val dec = serde match {
        case AvroValueSerde => KafkaWiring.decodeAvro(reshaped, valueSchema)
        case JsonValueSerde => KafkaWiring.decode(reshaped, valueSchema)
      }
      dec.select(col("left.*"), col("right.*"))
        .as[(Long, Long, String, Long, String)].collect().toSet
    }
    val expected = Set(
      (1L, 10L, "a", 10L, "ten"), (2L, 10L, "b", 10L, "ten"),
      (3L, 20L, "c", 20L, "twenty"))
    assert(run(AvroValueSerde) == expected)
    assert(run(JsonValueSerde) == expected)
  }
}
