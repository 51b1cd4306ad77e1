package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's own demo, end-to-end: the literal HackerNews records
  * from its README (FIXTURES.md §A golden records) through
  * decode → indexStream → stateful join → parsed → encode — asserting
  * the joined output the reference documents for
  * `hn.comments-with-story`. The join core runs in batch mode here
  * (same code path, single group invocation), so this is a pure
  * fixture test with no streaming harness.
  */
class GoldenFixtureSpec extends SparkSpec {
  import spark.implicits._

  private val commentSchema = StructType(Seq(
    StructField("by", StringType), StructField("id", LongType),
    StructField("parent", LongType), StructField("text", StringType),
    StructField("time", LongType), StructField("type", StringType),
    StructField("story", LongType)))

  private val storySchema = StructType(Seq(
    StructField("by", StringType), StructField("descendants", LongType),
    StructField("id", LongType), StructField("kids", ArrayType(LongType)),
    StructField("score", LongType), StructField("time", LongType),
    StructField("title", StringType), StructField("type", StringType),
    StructField("url", StringType), StructField("text", StringType)))

  // golden records: /root/reference/README.md:17,22 (via FIXTURES.md §A)
  private val commentJson =
    """{"by":"zinekeller","id":32546427,"parent":32546388,"text":"...","time":1661132891,"type":"comment","story":32545513}"""
  private val storyJson =
    """{"by":"thesuperbigfrog","descendants":40,"id":32545513,"score":50,"time":1661124181,"title":"The Google Pixel 6a highlights everything wrong with the U.S. phone market","type":"story","url":"https://www.xda-developers.com/google-pixel-6a-us-market-editorial/"}"""

  private def kafkaShaped(key: String, json: String, offset: Long) =
    Seq((key, json, java.sql.Timestamp.valueOf("2022-08-22 01:00:00"), offset))
      .toDF("k", "v", "timestamp", "offset")
      .select(col("k").cast("binary").as("key"), col("v").cast("binary").as("value"),
        col("timestamp"), col("offset"))

  test("the README demo joins to the documented comments-with-story record") {
    val comments = KafkaWiring.decode(kafkaShaped("32546427", commentJson, 10L), commentSchema)
      .drop("record_key")
    val stories = KafkaWiring.decode(kafkaShaped("32545513", storyJson, 3L), storySchema)
      .drop("record_key")
    val index = StreamDenormalize.indexStream(
      comments, leftKey = col("id"), leftFk = col("story"), leftSeq = col("seq"),
      stories, rightKey = col("id"), rightSeq = col("seq"),
      leftTie = col("tie"), rightTie = col("tie"))
    // batch-mode invocation of the same stateful core
    val joined = StreamDenormalize.joined(index, "inner")
    val parsed = StreamDenormalize.parsed(joined,
      comments.drop("seq", "tie").schema, stories.drop("seq", "tie").schema)
    val row = parsed.collect().head

    assert(row.getAs[String]("out_key") == "32546427") // output key = comment id
    val c = row.getAs[org.apache.spark.sql.Row]("left")
    assert(c.getAs[String]("by") == "zinekeller")
    assert(c.getAs[Long]("story") == 32545513L)
    val st = row.getAs[org.apache.spark.sql.Row]("right")
    assert(st.getAs[String]("by") == "thesuperbigfrog")
    assert(st.getAs[Long]("id") == 32545513L)
    assert(st.getAs[Long]("score") == 50L)
    assert(st.isNullAt(st.fieldIndex("text"))) // absent field → null (JsonSerde)

    // encode to the output-topic shape: nested {comment, story} JSON
    val encoded = KafkaWiring.encode(
      parsed.select(col("out_key"), col("left").as("comment"), col("right").as("story")),
      col("out_key"), Seq(col("comment"), col("story")))
    val value = new String(encoded.collect().head.getAs[Array[Byte]]("value"), "UTF-8")
    assert(value.contains(""""comment":{"""))
    assert(value.contains(""""story":{"""))
    assert(value.contains(""""id":32546427"""))
    assert(value.contains(""""id":32545513"""))
  }
}
