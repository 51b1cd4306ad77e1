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

/** Dynamic partition overwrite: the parquet-level incremental-upsert
  * pattern — reprocessing one partition replaces ONLY that partition,
  * leaving the rest of a (100 TB) table untouched. This is how batch
  * recomputation ships downstream of the streaming core when no
  * transactional table format is available.
  */
class PartitionOverwriteSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("overwriting one partition leaves sibling partitions intact") {
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_dpo").toString
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // per-partition (row count, content fingerprint) — counts alone
    // would miss a rewrite that corrupts values at equal cardinality
    def partitionPrints(): Map[String, (Long, Long)] =
      spark.read.parquet(out).groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          bit_xor(xxhash64(col("event_id"), col("value"))).as("fp"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    try {
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
      val before = partitionPrints()

      // "reprocess" only the purchase partition: halve its rows
      ev.filter(col("event_type") === "purchase")
        .filter(col("event_id") % 2 === 0)
        .write.mode("overwrite").partitionBy("event_type").parquet(out)

      val after = partitionPrints()
      assert(after("purchase")._1 < before("purchase")._1) // touched partition changed
      for ((t, print) <- before if t != "purchase")        // siblings identical in content
        assert(after(t) == print, t)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      SparkEntry.rmTree(out)
    }
  }
}
