package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-key LAG — the streaming primitive the counter-sum /
  * lookup / seen-set state shapes in this engine don't cover: each
  * key's PREVIOUS row rides in keyed state, so every arrival emits its
  * (previous, current) pair exactly once and replaces the state. This
  * is the core of delta encoding, CDC old/new pairing, inter-arrival
  * timing, and sequence featurization (q207 uses it to maintain q202's
  * Markov transition counts live).
  *
  * Ordering contract — the same one the reference engine leans on
  * (Kafka delivers per partition in offset order; its join transformer
  * processes records in that order, never re-sorting): WITHIN a batch
  * this operator sorts each key's rows by (ts_ns, event_id) before
  * chaining, so intra-batch arrival order never matters; ACROSS
  * batches it trusts the transport to deliver each key's records in
  * event order (Kafka key-partitioning gives exactly this; the q207
  * harness stages the log user-partitioned and time-sorted to model
  * it). A key that time-travels across batch boundaries would chain
  * wrongly — that is the transport's contract to keep, not repairable
  * here without buffering unbounded history.
  *
  * State: ONE row per key (the last event), O(keys) whatever the log
  * length — the bounded-state production shape. Emission: exactly one
  * pair per arrival after the key's first, so the emitted multiset
  * over any prefix equals the batch lead() derivation on that prefix.
  */
object StreamSequence {
  case class Ev(user_id: Long, ts_ns: Long, event_id: Long, event_type: String)
  case class LastEv(ts_ns: Long, event_id: Long, event_type: String)
  case class Transition(user_id: Long, cur: String, nxt: String)

  def transitions(ev: Dataset[Ev]): Dataset[Transition] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEv, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[LastEv]) =>
          val sorted = rows.toArray.sortBy(e => (e.ts_ns, e.event_id))
          val out = Array.newBuilder[Transition]
          var prev = state.getOption
          for (e <- sorted) {
            prev.foreach(p => out += Transition(uid, p.event_type, e.event_type))
            prev = Some(LastEv(e.ts_ns, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }
}
