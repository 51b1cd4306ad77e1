package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.ConcurrentHashMap

/** Session-safe once-per-key artifact cache — ONE implementation of the
  * discipline the operators had re-grown independently (Similarity's
  * codes tables, Analytics' PageRank adjacency, PipelineOps' curation /
  * BM25 / delta-join artifacts): build an expensive frame once per
  * (key), serve it from an eagerly-materialized `localCheckpoint`
  * thereafter, and never serve a frame owned by a stopped or foreign
  * SparkSession (the stale hit is evicted and rebuilt — keying by
  * session instead would pin stopped sessions, and their checkpoint
  * blocks, for the JVM lifetime).
  *
  * Publication is ATOMIC via `ConcurrentHashMap.compute`: two racing
  * threads cannot both build (the round-11 advice's orphaned-
  * checkpoint hazard) — the loser blocks on the bin lock and receives
  * the winner's frame. The deliberate trade-off: the builder runs
  * Spark jobs while holding the key's bin lock, so concurrent builds
  * of DIFFERENT keys that hash to one bin serialize. For these caches
  * (a handful of keys, sequential harnesses) that is the right side of
  * the trade — correctness by construction over parallel build
  * throughput; a server embedding graft with genuinely concurrent
  * first-touch builds would swap in a per-key future map.
  *
  * NO RE-ENTRANCY: a builder must never call back into `cached` on the
  * SAME map (e.g. one cached artifact kind composing another through
  * this map) — `ConcurrentHashMap.compute`'s contract makes a
  * re-entrant mutation of the map deadlock or throw
  * IllegalStateException. Composing artifacts is fine across DIFFERENT
  * maps (each operator family owns its own), or by building the inner
  * frame before entering `cached`. No current call site re-enters;
  * keep it that way, or switch to the per-key-future memoizer which
  * runs builders outside the map lock.
  */
private[graft] object ArtifactCache {
  def cached[K](cache: ConcurrentHashMap[K, DataFrame], key: K, s: SparkSession)(
      build: => DataFrame): DataFrame =
    cache.compute(key, (_, hit) =>
      if (hit != null && (hit.sparkSession eq s) && !s.sparkContext.isStopped) hit
      else isolated(build))

  /** `localCheckpoint` that is a PLAN boundary, not just a compute
    * boundary: the checkpoint's inherited origin-constraint set
    * (SPARK-39748) is dropped (stats kept). Artifacts are built from
    * wide expression derivations, and consumers plan joins/filters
    * above them — with inheritance, the constraint fixpoint re-grinds
    * the builder's trees on EVERY consumer plan (34 s of driver time
    * per q180 invocation before this; see GraftCheckpointBridge).
    */
  def isolated(df: DataFrame): DataFrame =
    org.apache.spark.sql.execution.GraftCheckpointBridge
      .dropOriginConstraints(df.localCheckpoint(true))
}
