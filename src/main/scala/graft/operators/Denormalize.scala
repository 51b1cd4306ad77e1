package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch denormalization: a many-to-one foreign-key join between a fact
  * ("left" — e.g. comments) and a dimension ("right" — e.g. stories) table,
  * with upsert (latest-value-per-key) semantics on both sides before the
  * join.
  *
  * This is the batch core of the reference engine
  * (`/root/reference/streaming/src/main/java/dev/poire/denormalize/dsl/StreamDenormalize.java:21-76`):
  * the compacted index topic + KTable materialization is "latest value per
  * key" (SURVEY.md §2 O8), and the stateful transformer is an FK equi-join
  * with four variants (O9-O11). In Spark, the continuously-maintained
  * answer over latest-per-key snapshots is exactly
  * `latestPerKey(left) JOIN latestPerKey(right)` — Catalyst plans the
  * shuffle-on-FK that the reference hand-builds with its custom
  * `JoinKeyPartitioner` (`transform/JoinKeyPartitioner.java:20-22`), and
  * broadcasts the dimension side when it is small.
  *
  * Scale notes (100 TB): the join shuffles both sides on the FK only —
  * identical data movement to the reference's FK-digest partitioner. When
  * the dimension fits in executor memory we broadcast it instead
  * (`broadcastRight`), eliminating the fact-side shuffle entirely. Skewed
  * FKs are handled by Spark AQE's skew-join splitting, which should stay
  * enabled on real clusters.
  *
  * Mirrors the reference builder surface:
  *   - `joinOn`     — FK from the left *value* (`StreamDenormalize.java:43-53`)
  *   - `joinOnKeys` — FK from the left *key*  (`StreamDenormalize.java:48-53`)
  *   - exactly one of the two must be set (`StreamDenormalize.java:37-38`)
  *   - `joiner`     — output projection (O12, `ValueJoiner`)
  *   - `keyMapper`  — output key column (O13, `KeyValueMapper`)
  */
final case class Denormalize(
    left: DataFrame,
    right: DataFrame,
    rightKey: String,
    joinOnValue: Option[DataFrame => Column] = None,
    joinOnKeys: Option[DataFrame => Column] = None,
    leftKey: Option[String] = None,
    leftVersionOrder: Option[Seq[Column]] = None,
    rightVersionOrder: Option[Seq[Column]] = None,
    joiner: Option[(DataFrame, DataFrame) => Seq[Column]] = None,
    keyMapper: Option[(Column, Column) => Column] = None,
    broadcastRight: Boolean = false,
    saltBuckets: Int = 0) {

  def joinOn(f: DataFrame => Column): Denormalize = {
    require(joinOnKeys.isEmpty, "joinOn XOR joinOnKeys (reference rule, StreamDenormalize.java:37-38)")
    copy(joinOnValue = Some(f))
  }
  def joinOnLeftKey(f: DataFrame => Column): Denormalize = {
    require(joinOnValue.isEmpty, "joinOn XOR joinOnKeys (reference rule, StreamDenormalize.java:37-38)")
    copy(joinOnKeys = Some(f))
  }
  def withLeftKey(k: String): Denormalize = copy(leftKey = Some(k))
  def withLeftVersionOrder(cols: Column*): Denormalize = copy(leftVersionOrder = Some(cols))
  def withRightVersionOrder(cols: Column*): Denormalize = copy(rightVersionOrder = Some(cols))
  def withJoiner(f: (DataFrame, DataFrame) => Seq[Column]): Denormalize = copy(joiner = Some(f))
  def withKeyMapper(f: (Column, Column) => Column): Denormalize = copy(keyMapper = Some(f))
  /** Force-broadcast the dimension side. OFF by default: an
    * unconditional hint overrides autoBroadcastJoinThreshold and AQE,
    * and a dimension bigger than executor memory would OOM instead of
    * falling back to a shuffle join — let the planner decide unless the
    * caller KNOWS the side is small.
    */
  def withBroadcastRight(b: Boolean): Denormalize = copy(broadcastRight = b)

  /** Salt the join for hot-FK skew: lefts get a deterministic salt from
    * their row, the right side is replicated `n` times (salt 0..n-1),
    * and the join key becomes (fk, salt) — one hot FK fans across `n`
    * reducers instead of one straggler. Inner/left-outer only (replicated
    * unmatched rights would duplicate under right/full outer). Prefer
    * AQE's skew-join splitting where available; salting is the static
    * fallback for engines/plans AQE can't rewrite.
    */
  def withSkewSalting(n: Int): Denormalize = copy(saltBuckets = n)

  private def fkOf(df: DataFrame): Column = (joinOnValue, joinOnKeys) match {
    case (Some(f), None) => f(df)
    case (None, Some(f)) => f(df)
    case _ => throw new IllegalArgumentException(
      "exactly one of joinOn / joinOnLeftKey must be set (StreamDenormalize.java:37-38)")
  }

  private def snapshot(df: DataFrame, key: Option[String], order: Option[Seq[Column]]): DataFrame =
    (key, order) match {
      case (Some(k), Some(o)) => Upsert.latestPerKey(df, Seq(col(k)), o)
      case _ => df // already one row per key (or upsert not requested)
    }

  /** Build the joined DataFrame for one of the four reference join types
    * (`JoinTransformer.java:72-130`): "inner" | "left_outer" |
    * "right_outer" | "full_outer".
    */
  def join(joinType: String): DataFrame = {
    val l0 = snapshot(left, leftKey, leftVersionOrder)
    val r0 = snapshot(right, Some(rightKey), rightVersionOrder)
    val salted = saltBuckets > 1
    require(!salted || joinType == "inner" || joinType == "left_outer",
      "skew salting supports inner/left_outer only")
    val l = {
      val base = l0.withColumn("__fk", fkOf(l0))
      if (salted) base.withColumn("__salt",
        pmod(xxhash64(l0.columns.map(col).toSeq: _*), lit(saltBuckets)).cast("int"))
      else base
    }
    val r1 = {
      val base = r0.withColumnRenamed(rightKey, "__rk")
      if (salted) base.withColumn("__salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
      else base
    }
    // broadcasting the build (right) side is unsupported for right/full
    // outer joins — Spark would warn and fall back; don't hint there
    val canBroadcast = joinType == "inner" || joinType.startsWith("left")
    val r = if (broadcastRight && canBroadcast) broadcast(r1) else r1
    val cond =
      if (salted) l("__fk") === r("__rk") && l("__salt") === r("__salt")
      else l("__fk") === r("__rk")
    val joined = l.join(r, cond, joinType)
    // default joiner: all left columns then all right columns (reference
    // default output is the nested pair; flat here so the DuckDB oracle
    // can express it — nested variant via withJoiner)
    val projection = joiner.map(f => f(l, r)).getOrElse(
      l0.columns.map(c => l(c)).toSeq ++ r0.columns.filter(_ != rightKey).map(c => r(c)))
    val withKey = keyMapper.map(f => projection :+ f(l("__fk"), r("__rk")).as("out_key"))
      .getOrElse(projection)
    joined.select(withKey: _*)
  }

  def inner: DataFrame = join("inner")
  def leftOuter: DataFrame = join("left_outer")
  def rightOuter: DataFrame = join("right_outer")
  def fullOuter: DataFrame = join("full_outer")
}

object Denormalize {
  def builder(left: DataFrame, right: DataFrame, rightKey: String): Denormalize =
    Denormalize(left, right, rightKey)
}
