package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of cohort retention (`operators/Funnels
  * .retentionCohorts`): per-user (cohort, offset) activity cells
  * emitted exactly once, watermark-finalized.
  *
  * Correctness argument: a user's cohort anchor is the minimum event
  * time, and once ANY event is finalized every future arrival has a
  * strictly later timestamp than the watermark ≥ the finalized
  * minimum — so the anchor is final after the first watermark pass and
  * each (cohort, offset) cell derived from finalized events is final
  * too (Append mode; a downstream streaming count over the cells is
  * the live retention table). State per user: the out-of-orderness
  * buffer, the anchor, and the emitted offsets (bounded by horizon ÷
  * period, never by event count).
  */
object RetentionStream {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  final case class CellReach(user_id: Long, cohort_w: Long, week_offset: Long)
  final case class RetState(buffer: Vector[Long], t0: Option[Long],
                            emitted: Vector[Long])

  def cellReaches(events: Dataset[Ev], periodUs: Long): Dataset[CellReach] = {
    require(periodUs > 0)
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, CellReach](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[RetState]) =>
          val prev = state.getOption
            .getOrElse(RetState(Vector.empty, None, Vector.empty))
          val buf = prev.buffer ++ it.map(_.ts_us).toVector
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strictly below the watermark (the FunnelStream rule): an
          // event with ts == watermark is still admissible later and
          // could be an earlier-anchor candidate than none folded yet
          val (due, pending) = buf.partition(_ < wmUs)
          var t0 = prev.t0
          var emitted = prev.emitted.toSet
          val out = Vector.newBuilder[CellReach]
          for (t <- due.sorted) {
            if (t0.isEmpty) t0 = Some(t)
            val off = (t - t0.get) / periodUs
            if (!emitted(off)) {
              emitted += off
              out += CellReach(uid, t0.get / periodUs, off)
            }
          }
          if (pending.isEmpty && t0.isEmpty) state.remove()
          else {
            state.update(RetState(pending, t0, emitted.toVector.sorted))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          }
          out.result().iterator
      }
  }
}
