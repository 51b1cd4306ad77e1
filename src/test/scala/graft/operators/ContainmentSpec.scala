package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** q197's prefix + size filters are pruning steps that must be
  * LOSSLESS at the threshold: this property-checks the whole operator
  * (filters + exact verify) against a brute-force containment scan on
  * randomized corpora with planted containments.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    def shingleSet(text: String): Set[String] = {
      val toks = text.toLowerCase.split(" ", -1)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, tx) => id -> shingleSet(tx) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh
      if a != b && sa.nonEmpty
      inter = (sa & sb).size.toDouble
      c = inter / sa.size
      if c >= t
    } yield (a, b, c)).toSet
  }

  test("containment pairs equal brute force on randomized corpora with planted containments") {
    val rnd = new Random(7)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    for (trial <- 1 to 3) {
      val base = Seq.tabulate(12) { i =>
        i.toLong -> Seq.fill(6 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // plant: doc 100+i = doc i's text wrapped in noise (contains it);
      // doc 200 = a short doc fully inside doc 0
      val planted = base.take(3).map { case (id, tx) =>
        (100L + id) -> s"${vocab(rnd.nextInt(40))} $tx ${vocab(rnd.nextInt(40))} ${vocab(rnd.nextInt(40))}"
      } :+ (200L -> base.head._2.split(" ").take(5).mkString(" "))
      val docs = base ++ planted
      val t = 0.9
      val sh = Dedup.docShingles(docs.toDF("doc_id", "text"), col("text"))
      val got = Dedup.containmentPairsFrom(sh, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = bruteForce(docs, t)
      assert(got == want, s"trial $trial: got ${got.size}, want ${want.size}\n" +
        s"missing=${want -- got}\nextra=${got -- want}")
      // the planted full-inclusion must be found (A ⊆ B → containment 1.0)
      assert(want.exists { case (a, b, c) => a >= 100L && c == 1.0 },
        s"trial $trial fixture lost its planted containment")
    }
  }
}
