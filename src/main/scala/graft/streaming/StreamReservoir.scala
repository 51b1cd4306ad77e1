package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** The STREAMING weighted reservoir — the reason the Efraimidis–
  * Spirakis key construction exists at all (their 2006 paper is about
  * reservoirs, not batch ranking): because an item's key is fixed at
  * arrival and the sample is "the k largest keys seen so far", keyed
  * state of EXACTLY k items per stratum maintains an exact weighted
  * without-replacement sample over an unbounded stream. Unlike the
  * per-key LAG (StreamSequence), this state shape needs NO ordering
  * contract — top-k is order-independent — so the converged state
  * equals the batch rank (q209) under ANY arrival order, batching, or
  * partitioning.
  *
  * State: k items per stratum, O(k·strata) whatever the stream length
  * — the selling point vs "sort the corpus and take k". Emission:
  * Update mode, one snapshot per (stratum, batch) with a monotone
  * `rev`; the serving read is the O8 compaction (latest rev per
  * stratum), exactly the compacted-topic pattern.
  */
object StreamReservoir {
  case class DocKeyed(source: String, doc_id: Long, quality: Double,
                      es_key: Double)
  case class ResSnapshot(source: String, rev: Long, items: Seq[DocKeyed])

  def reservoirTopK(docs: Dataset[DocKeyed], k: Int): Dataset[ResSnapshot] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .mapGroupsWithState[ResSnapshot, ResSnapshot](GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[DocKeyed], state) =>
          val prev = state.getOption
          val merged = (prev.map(_.items).getOrElse(Seq.empty) ++ rows)
            .sortBy(d => (-d.es_key, d.doc_id)).take(k)
          val snap = ResSnapshot(src, prev.map(_.rev).getOrElse(0L) + 1L, merged)
          state.update(snap)
          snap
      }
  }
}
