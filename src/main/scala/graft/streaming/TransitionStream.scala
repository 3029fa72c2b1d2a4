package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the event-transition matrix (`operators/Funnels
  * .transitions`): per-user (from_type → to_type) adjacency pairs
  * emitted exactly once, watermark-finalized — a downstream streaming
  * count over the pairs is the live transition matrix.
  *
  * Correctness argument: the batch operator orders each user's history
  * by (ts, event_id) and takes adjacent pairs. The stream buffers
  * events until the watermark passes them, folds the due events in that
  * order, and emits the pair (prev → e) as each event e is folded —
  * every emitted pair is final because both endpoints are finalized and
  * no admissible future event can sort between them (any later arrival
  * is strictly above the watermark > both endpoints). State per user is
  * the out-of-orderness buffer plus ONE last-finalized event (the
  * AsOfStream discipline — never the history); an event-time timeout
  * drains buffered events without requiring traffic on the key.
  */
object TransitionStream {

  /** `ts_us` must equal `unix_micros(ts)`; `event_id` is the batch
    * operator's tie-break within equal timestamps. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                      event_id: Long, event_type: String)
  final case class Pair(user_id: Long, from_type: String, to_type: String)
  final case class TransState(buffer: Vector[(Long, Long, String)],
                              last: Option[(Long, Long, String)])

  def pairReaches(events: Dataset[Ev]): Dataset[Pair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, Pair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[TransState]) =>
          val prev = state.getOption
            .getOrElse(TransState(Vector.empty, None))
          val buf = prev.buffer ++
            it.map(e => (e.ts_us, e.event_id, e.event_type)).toVector
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strictly below the watermark (the FunnelStream rule): an
          // event at ts == watermark could still be preceded by an
          // admissible arrival at the same timestamp
          val (due, pending) = buf.partition(_._1 < wmUs)
          var last = prev.last
          val out = Vector.newBuilder[Pair]
          for (e <- due.sorted) {
            last.foreach(l => out += Pair(uid, l._3, e._3))
            last = Some(e)
          }
          state.update(TransState(pending, last))
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          out.result().iterator
      }
  }
}
