package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BPE re-segmentation semantics (q183/q188) — in particular
  * the greedy left-to-right overlap rule, which only matters when the
  * merge pair is a doubled symbol (w1 = w2): occurrences of (w1, w2)
  * with w1 ≠ w2 can never overlap (an occurrence at i and i+1 would
  * force w1 = w2), so "greedy" reduces to run-offset parity inside
  * maximal equal-symbol runs.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def applyRule(seqs: Seq[(Long, Seq[String])],
      w1: String, w2: String): Map[Long, Seq[String]] = {
    val df = seqs.toDF("doc_id", "syms")
    val best = Seq((w1, w2, 1L)).toDF("w1", "w2", "cnt")
    TextAnalysis.bpeApply(df, best)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
  }

  test("w1 != w2: every occurrence merges; adjacent occurrences don't overlap") {
    val out = applyRule(Seq(
      1L -> Seq("a", "b", "c"),
      2L -> Seq("a", "b", "a", "b"), // back-to-back occurrences both merge
      3L -> Seq("x", "a", "b", "b"), // second b untouched
      4L -> Seq("b", "a"), // no occurrence
      5L -> Seq("a")), "a", "b")
    assert(out(1L) == Seq("a b", "c"))
    assert(out(2L) == Seq("a b", "a b"))
    assert(out(3L) == Seq("x", "a b", "b"))
    assert(out(4L) == Seq("b", "a"))
    assert(out(5L) == Seq("a"))
  }

  test("w1 = w2: greedy left-to-right pairs even run offsets") {
    val out = applyRule(Seq(
      1L -> Seq("a", "a", "a"), // odd run: (aa) a
      2L -> Seq("a", "a", "a", "a"), // even run: (aa)(aa)
      3L -> Seq("a", "a", "b", "a", "a", "a"), // runs reset across the break
      4L -> Seq("b", "a", "a")), "a", "a")
    assert(out(1L) == Seq("a a", "a"))
    assert(out(2L) == Seq("a a", "a a"))
    assert(out(3L) == Seq("a a", "b", "a a", "a"))
    assert(out(4L) == Seq("b", "a a"))
  }

  test("merged symbols compose across rounds") {
    // round 2 can merge a round-1 product with a plain symbol
    val out = applyRule(Seq(1L -> Seq("a b", "c", "a b")), "a b", "c")
    assert(out(1L) == Seq("a b c", "a b"))
  }

  test("argmax rule is (cnt desc, w1 asc, w2 asc)") {
    val pc = Seq(("b", "c", 3L), ("a", "z", 3L), ("a", "b", 3L), ("z", "z", 9L))
      .toDF("w1", "w2", "cnt")
    val best = TextAnalysis.bpeBest(pc).collect().head
    assert((best.getString(0), best.getString(1), best.getLong(2)) == (("z", "z", 9L)))
    val tie = TextAnalysis.bpeBest(pc.filter(col("cnt") === 3)).collect().head
    assert((tie.getString(0), tie.getString(1)) == (("a", "b")))
  }
}
