package graft.operators

import graft.SparkSpec

class DedupAggSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("custom MinHash Aggregator equals the 16-column min() form") {
    val a = Dedup.minhashSignatures(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toSeq).toMap
    val b = Dedup.minhashSignaturesAgg(spark, dir).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(i => r.getLong(i)).toSeq).toMap
    assert(a.keySet == b.keySet)
    assert(a.forall { case (k, v) => b(k) == v })
  }
}

class PrefixFilterSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.01"

  test("PPJoin prefix+size+positional filters are lossless vs brute force") {
    // brute force: every pair sharing ANY shingle, exact Jaccard filter
    val sh = Dedup.docShingles(graft.Tables.load(spark, dir, "documents"), col("text"))
    val inv = sh.select(col("doc_id"), col("n_sh"), explode(col("shingles")).as("s"))
    val brute = inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).cast("double").as("inter"))
      .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = Dedup.exactNearDuplicates(spark, dir)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == brute)
    assert(brute.nonEmpty) // sanity: the corpus has planted near-dups
  }
}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import java.sql.Timestamp

  test("streaming dropDuplicates with watermark (O21 streaming analog)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val q = input.toDS().toDF("ts", "id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("id")
      .writeStream.format("memory").queryName("dd_out").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      input.addData((t0, 1L), (t0, 1L), (t0, 2L))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() == 2) // in-batch dup suppressed
      input.addData((Timestamp.valueOf("2024-01-01 10:05:00"), 1L))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() == 2) // cross-batch dup suppressed
      input.addData((Timestamp.valueOf("2024-01-01 10:06:00"), 3L))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() == 3) // new id passes
    } finally q.stop()
  }
}
