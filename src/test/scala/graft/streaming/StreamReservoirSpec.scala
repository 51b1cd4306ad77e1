package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The bounded-list reservoir state contract (q211's core): state
  * holds EXACTLY the k largest-key items per stratum, converges to the
  * batch top-k under any batching, and never grows past k.
  */
class StreamReservoirSpec extends SparkSpec {
  import spark.implicits._
  import StreamReservoir._

  private var n = 0
  private def run(batches: Seq[Seq[DocKeyed]], k: Int): Seq[ResSnapshot] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[DocKeyed]
    n += 1
    val name = s"res_out_$n"
    val q = reservoirTopK(input.toDS(), k)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try batches.foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[ResSnapshot].collect().toSeq
  }

  private def d(id: Long, key: Double, src: String = "a") =
    DocKeyed(src, id, 0.5, key)

  test("state is capped at k and keeps the largest keys across batches") {
    val snaps = run(Seq(
      Seq(d(1, -1.0), d(2, -5.0), d(3, -3.0)),
      Seq(d(4, -0.5), d(5, -9.0))), k = 2)
    val last = snaps.filter(_.source == "a").maxBy(_.rev)
    // top-2 keys overall: -0.5 (id 4), -1.0 (id 1); id 2/3/5 evicted
    assert(last.items.map(_.doc_id) == Seq(4L, 1L))
    assert(snaps.forall(_.items.size <= 2))
  }

  test("any batching yields the same converged sample (order independence)") {
    val all = Seq(d(1, -2.0), d(2, -1.0), d(3, -4.0), d(4, -0.1), d(5, -3.0))
    val a = run(Seq(all), k = 3).maxBy(_.rev).items
    val b = run(all.reverse.map(Seq(_)), k = 3).maxBy(_.rev).items
    assert(a == b && a.map(_.doc_id) == Seq(4L, 2L, 1L))
  }

  test("strata are independent reservoirs") {
    val snaps = run(Seq(Seq(d(1, -1.0, "a"), d(2, -2.0, "b"), d(3, -0.5, "b"))), k = 1)
    val bySrc = snaps.groupBy(_.source).map { case (s, v) => s -> v.maxBy(_.rev).items.map(_.doc_id) }
    assert(bySrc == Map("a" -> Seq(1L), "b" -> Seq(3L)))
  }

  test("key ties break by doc_id (deterministic sample)") {
    val last = run(Seq(Seq(d(9, -1.0), d(4, -1.0), d(7, -1.0))), k = 2).maxBy(_.rev)
    assert(last.items.map(_.doc_id) == Seq(4L, 7L))
  }
}
