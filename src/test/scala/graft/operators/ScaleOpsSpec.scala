package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within its rsd contract vs exact") {
    val approx = Analytics.approxDistinctUsers(spark, dir, rsd = 0.02)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .select("event_type", "n").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    for ((k, e) <- exact) {
      val a = approx(k)
      val rel = math.abs(a - e).toDouble / e
      assert(rel <= 0.06, s"$k: approx $a vs exact $e (rel err $rel)") // 3× rsd headroom
    }
  }

  test("frameSample covers every stride-th window and digests match substrings") {
    val frames = Multimodal.frameSample(spark, "/root/testdata/sf0.001", frameChars = 100, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getInt(3))).toMap
    val texts = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(frames.nonEmpty)
    for (((docId, idx), (md5Hex, nChars)) <- frames.take(200)) {
      val t = texts(docId)
      val chunk = t.substring(math.min(idx * 100, t.length),
        math.min(idx * 100 + 100, t.length))
      assert(nChars == chunk.length)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5Hex == md, s"doc $docId frame $idx")
    }
    // stride: only even frame indices present
    assert(frames.keys.forall(_._2 % 2 == 0))
  }

  test("balanceBySize spreads blobs across the requested partitions") {
    val df = Multimodal.balanceBySize(Multimodal.mediaTable(spark, dir), 4)
    assert(df.rdd.getNumPartitions == 4)
    // hash spread: no partition holds more than half the corpus
    val n = df.count()
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.forall(_ <= n / 2), sizes.mkString(","))
  }

  test("bucketed tables co-locate the join: no shuffle in the plan") {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    c.write.mode("overwrite").option("path", s"$wh/customer_b")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
    try {
      // disable auto-broadcast so the join would OTHERWISE shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == o.join(c, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}

class SessionWindowBoundarySpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("session_window MERGES events exactly one gap apart (pins the oracle's > rule)") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t30 = java.sql.Timestamp.valueOf("2026-01-01 00:30:00") // exactly the gap
    val t61 = java.sql.Timestamp.valueOf("2026-01-01 01:00:01") // just past it
    val df = Seq((1L, t0), (1L, t30), (1L, t61)).toDF("user_id", "ts")
    val sessions = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n")).collect()
    // t0+t30 merge (closed extent at last+gap); t61 is 30:01 after t30 → new session
    assert(sessions.length == 2, sessions.mkString(","))
    assert(sessions.map(_.getAs[Long]("n")).sorted.toSeq == Seq(1L, 2L))
  }
}
