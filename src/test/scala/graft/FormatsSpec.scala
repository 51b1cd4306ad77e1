package graft

import org.apache.spark.sql.functions._

/** Source-format coverage: the engine's operators are format-agnostic
  * DataFrame transforms, so any Spark-supported format feeds them. These
  * roundtrips pin that ORC, CSV, and JSON-lines inputs produce
  * bit-identical operator results to the parquet originals.
  */
class FormatsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fmt_$tag").toString

  // XOR-fold of row hashes: order-independent and overflow-free (a sum
  // of 64-bit hashes overflows under ANSI arithmetic)
  private def fingerprint(df: org.apache.spark.sql.DataFrame): Long =
    df.agg(bit_xor(xxhash64(col("doc_id"), col("text")))).head().getLong(0)

  test("ORC roundtrip preserves the documents table exactly") {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val out = tmp("orc")
    docs.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == docs.count())
    assert(fingerprint(back) == fingerprint(docs))
  }

  test("CSV roundtrip with explicit schema feeds the text operators identically") {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val out = tmp("csv")
    docs.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(out)
    val back = spark.read.schema(docs.schema).option("header", "true").csv(out)
    val a = operators.TextAnalysis.tokenCounts(docs, col("text"))
      .collect().map(_.toSeq).toSet
    val b = operators.TextAnalysis.tokenCounts(back, col("text"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("JSON-lines roundtrip (the Kafka value shape) is lossless for events") {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val out = tmp("json")
    ev.write.mode("overwrite").json(out)
    val back = spark.read.schema(ev.schema).json(out)
    assert(back.count() == ev.count())
    val a = ev.agg(bit_xor(xxhash64(col("event_id"), col("user_id"), col("event_type"))))
      .head().getLong(0)
    val b = back.agg(bit_xor(xxhash64(col("event_id"), col("user_id"), col("event_type"))))
      .head().getLong(0)
    assert(a == b)
  }
}
