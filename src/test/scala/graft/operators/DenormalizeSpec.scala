package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DenormalizeSpec extends SparkSpec {
  import spark.implicits._

  // comments(left: id, story FK, seq) / stories(right: id, title, seq)
  private def left = Seq(
    (1L, 100L, "c1-v1", 1L),
    (1L, 100L, "c1-v2", 3L), // upsert: latest version of comment 1
    (2L, 100L, "c2", 2L),
    (3L, 999L, "c3-dangling", 4L)
  ).toDF("id", "story", "text", "seq")

  private def right = Seq(
    (100L, "s100-v1", 1L),
    (100L, "s100-v2", 5L), // upsert: latest version of story 100
    (200L, "s200-no-comments", 2L)
  ).toDF("sid", "title", "rseq")

  private def base = Denormalize.builder(left, right, rightKey = "sid")
    .joinOn(df => df("story"))
    .withLeftKey("id")
    .withLeftVersionOrder(col("seq"))
    .withRightVersionOrder(col("rseq"))

  test("inner join: latest versions only, dangling FK dropped") {
    val out = base.inner.select("id", "text", "title").as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "c1-v2", "s100-v2"), (2L, "c2", "s100-v2")))
  }

  test("left outer: dangling left kept with null right") {
    val out = base.leftOuter.select("id", "text", "title")
      .as[(Long, String, Option[String])].collect().toSet
    assert(out == Set(
      (1L, "c1-v2", Some("s100-v2")), (2L, "c2", Some("s100-v2")),
      (3L, "c3-dangling", None)))
  }

  test("right outer: story without comments kept with null left") {
    val out = base.rightOuter.select("title", "text")
      .as[(String, Option[String])].collect().toSet
    assert(out.contains(("s200-no-comments", None)))
    assert(!out.exists(_._2.contains("c3-dangling")))
  }

  test("full outer: both unmatched sides kept") {
    val out = base.fullOuter.select("text", "title")
      .as[(Option[String], Option[String])].collect().toSet
    assert(out.contains((Some("c3-dangling"), None)))
    assert(out.contains((None, Some("s200-no-comments"))))
  }

  test("joinOn XOR joinOnKeys is enforced") {
    intercept[IllegalArgumentException] {
      Denormalize.builder(left, right, "sid").inner
    }
    intercept[IllegalArgumentException] {
      Denormalize.builder(left, right, "sid")
        .joinOn(_("story")).joinOnLeftKey(_("id"))
    }
  }

  test("keyMapper adds output key column (O13)") {
    val out = base.withKeyMapper((fk, _) => fk.cast("string")).inner
    assert(out.columns.contains("out_key"))
    assert(out.select("out_key").as[String].collect().toSet == Set("100"))
  }

  test("custom joiner projects nested structs (O12 reference shape)") {
    val out = base.withJoiner((l, r) =>
      Seq(struct(l("id"), l("text")).as("comment"), struct(r("title")).as("story"))).inner
    assert(out.schema.fieldNames.toSeq == Seq("comment", "story"))
    assert(out.select("comment.text").as[String].collect().toSet == Set("c1-v2", "c2"))
  }
}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "a", 10L), (1L, "b", 20L), (2L, "c", 5L), (2L, "d", 5L)
  ).toDF("k", "v", "ver")

  test("latestPerKey keeps highest version, deterministic tie-break") {
    val out = Upsert.latestPerKey(df, Seq(col("k")), Seq(col("ver"), col("v")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "b"), (2L, "d"))) // tie on ver=5 → "d" > "c" desc
  }

  test("latestPerKeyAgg equals window variant") {
    val a = Upsert.latestPerKeyAgg(df, Seq("k"), struct(col("ver"), col("v")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(a == Set((1L, "b"), (2L, "d")))
  }

  test("firstSeen keeps first arrival (O21 seen-set dedup)") {
    val out = Upsert.firstSeen(df, Seq(col("k")), Seq(col("ver"), col("v")))
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "c")))
  }

  test("tombstone compaction: latest tombstone deletes; older tombstone does not resurrect") {
    // key 1: live(10) < TOMB(20)        → deleted (tombstone suppresses older live)
    // key 2: TOMB(5)  < live(9)         → survives with the newer live row
    // key 3: TOMB(7) only               → deleted
    val rows = Seq(
      (1L, "a", 10L, false), (1L, "t", 20L, true),
      (2L, "t", 5L, true), (2L, "b", 9L, false),
      (3L, "t", 7L, true)
    ).toDF("k", "v", "ver", "tomb")
    val out = Upsert.latestPerKeyTombstone(
      rows.drop("tomb"), Seq("k"), col("ver"), col("v") === "t")
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(out == Set((2L, "b")))
  }
}
