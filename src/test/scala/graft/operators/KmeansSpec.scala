package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the in-engine Lloyd k-means kernels (q182/q187/q191) against a
  * brute-force Scala reference on small integer fixtures: exact
  * argmin + tie-break, grid-rounded mean updates, and the
  * empty-cluster carry.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def assignRef(x: Seq[(Long, Seq[Long])], c: Seq[(Long, Seq[Long])])
      : Map[Long, (Long, Long)] =
    x.map { case (id, xv) =>
      val scored = c.map { case (cid, cv) =>
        (xv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
      }.sorted // (dist, cid) lexicographic = dist asc, tie to lower cid
      id -> ((scored.head._2, scored.head._1))
    }.toMap

  test("assignment matches brute force incl. the lower-cid tie-break") {
    val x = Seq(
      1L -> Seq(0L, 0L), 2L -> Seq(10L, 0L), 3L -> Seq(5L, 0L), // 3 ties c1/c2
      4L -> Seq(0L, 9L))
    val c = Seq(1L -> Seq(0L, 0L), 2L -> Seq(10L, 0L), 3L -> Seq(0L, 10L))
    val got = Similarity.kmAssign(x.toDF("vec_id", "xq"), c.toDF("cid", "c"))
      .select(col("vec_id"), col("cid"), col("dist"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == assignRef(x, c))
    assert(got(3L)._1 == 1L) // the equidistant point goes to the LOWER cid
  }

  test("update rounds per-coordinate means onto the grid; empty clusters keep their centroid") {
    val prev = Seq(1L -> Seq(0L, 0L), 2L -> Seq(100L, 100L)).toDF("cid", "c")
    // cluster 1 gets points (0,1) and (0,2): mean j2 = 1.5 → rounds to 2
    // (HALF_UP); cluster 2 gets nothing and must carry (100,100)
    val assigned = Seq(
      (10L, Seq(0L, 1L), 1L, 0L), (11L, Seq(0L, 2L), 1L, 0L))
      .toDF("vec_id", "xq", "cid", "dist")
    val got = Similarity.kmUpdate(assigned, prev)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(0L, 2L))
    assert(got(2L) == Seq(100L, 100L))
  }

  test("two engine rounds equal a brute-force Lloyd reference on a fixture") {
    val x = Seq(
      1L -> Seq(0L, 0L), 2L -> Seq(2L, 0L), 3L -> Seq(0L, 2L),
      4L -> Seq(50L, 50L), 5L -> Seq(52L, 50L), 6L -> Seq(50L, 52L),
      7L -> Seq(100L, 0L), 8L -> Seq(102L, 0L))
    val xDf = x.toDF("vec_id", "xq")
    // init = Similarity.kmInit semantics: lowest ids → cid 1..C; use 3
    var cRef = Seq(1L -> Seq(0L, 0L), 2L -> Seq(2L, 0L), 3L -> Seq(0L, 2L))
    var cDf = cRef.toDF("cid", "c")
    for (_ <- 1 to 2) {
      val a = assignRef(x, cRef)
      cRef = cRef.map { case (cid, prev) =>
        val members = x.filter(p => a(p._1)._1 == cid).map(_._2)
        if (members.isEmpty) cid -> prev
        else cid -> prev.indices.map { j =>
          val s = members.map(_(j)).sum
          BigDecimal(s.toDouble / members.size)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
      }
      cDf = Similarity.kmUpdate(Similarity.kmAssign(xDf, cDf), cDf)
    }
    val got = cDf.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == cRef.toMap)
  }
}
