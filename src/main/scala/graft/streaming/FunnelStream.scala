package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the ordered funnel (`operators/Funnels.funnel`):
  * per-user step completions computed over an out-of-order event
  * stream with watermark-correct finalization.
  *
  * The batch semantics are an in-event-time-order fold per user (step
  * k+1 completes at the FIRST `steps(k+1)` event strictly after the
  * step-k time and within the window — min semantics), so the stream
  * buffers each user's events until the watermark passes them, then
  * folds the due events in (ts, type) order through the step machine:
  * every folded event is final by the watermark contract, and any
  * future event has a strictly later timestamp than an established
  * completion, so a locked step time can never be beaten — emissions
  * are final (Append mode). State per user is the out-of-orderness
  * buffer plus one timestamp per reached step, never the history (the
  * AsOfStream discipline); an event-time timeout drains buffered
  * events without requiring traffic on the key.
  */
object FunnelStream {

  /** `ts` must equal `timestamp_micros(ts_us)`; `ts_us` stays
    * authoritative so comparisons are exact µs longs. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                      event_type: String)
  /** A FINAL step completion: `step` is 1-based, `t_us` the earliest
    * qualifying event time. */
  final case class StepReach(user_id: Long, step: Int, event_type: String,
                             t_us: Long)
  final case class FunnelState(buffer: Vector[(Long, String)],
                               times: Vector[Long])

  def stepReaches(events: Dataset[Ev], steps: Seq[String],
                  withinUs: Long): Dataset[StepReach] = {
    require(steps.nonEmpty)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StepReach](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FunnelState]) =>
          val prev = state.getOption
            .getOrElse(FunnelState(Vector.empty, Vector.empty))
          val buf = prev.buffer ++
            it.map(e => (e.ts_us, e.event_type)).toVector
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // finalize STRICTLY below the watermark: the engine's late-row
          // filter drops only rows strictly older than it, so an event
          // with ts == watermark is still admissible later — folding at
          // equality could lock a completion a future arrival beats
          val (due, pending) = buf.partition(_._1 < wmUs)
          var times = prev.times
          val out = Vector.newBuilder[StepReach]
          for ((t, ty) <- due.sorted) {
            val k = times.length
            if (k < steps.length && ty == steps(k) &&
              (k == 0 || (t > times(k - 1) && t <= times(k - 1) + withinUs))) {
              times = times :+ t
              out += StepReach(uid, k + 1, ty, t)
            }
          }
          // a completed funnel can never emit again — drop the key (and
          // any still-pending buffer) outright
          if (times.length == steps.length) state.remove()
          else {
            state.update(FunnelState(pending, times))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          }
          out.result().iterator
      }
  }
}
