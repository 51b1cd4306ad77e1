package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q72: the stream-static broadcast denormalization must converge to
  * the relational join — the same contract the stateful cores (q08/q50)
  * are held to, reached with zero streaming state.
  */
class StreamStaticSpec extends SparkSpec {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("stream-static denormalization equals the batch broadcast join") {
    // sorted-Seq compare, not Set: the contract is MULTISET equality, so
    // a duplicate emission from the streaming path must fail the test
    val got = graft.SparkEntry.queries("q72_stream_static_denorm")(spark, dir)
      .select("event_id", "c_custkey", "c_name")
      .as[(Long, Long, String)].collect().toSeq.sorted
    val expect = graft.Tables.events(spark, dir)
      .join(graft.Tables.load(spark, dir, "customer"),
        col("user_id") === col("c_custkey"))
      .select("event_id", "c_custkey", "c_name")
      .as[(Long, Long, String)].collect().toSeq.sorted
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
