package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the as-of join (`plans/AsOfJoin.scala`): one keyed
  * event stream carrying BOTH sides (left = probe rows wanting a match,
  * right = state rows being matched against), with watermark-correct
  * out-of-order handling.
  *
  * A left row's verdict is final only once the event-time watermark has
  * passed its timestamp — at that point every right row with an earlier
  * timestamp has either arrived or is by-contract late-dropped, which is
  * exactly the batch operator's visibility rule. So the state machine per
  * key is:
  *
  *  - buffer arriving lefts until `watermark >= ts`;
  *  - emit each due left (in (ts, id) order) against the latest buffered
  *    right with `rt < ts` (`<=` when `allowExact`), tolerance applied to
  *    the single candidate (monotone, same argument as the batch exec);
  *  - prune rights to THE MINIMAL SUFFICIENT SET: every right still ahead
  *    of the watermark, plus the single latest right at-or-behind it (the
  *    only one any future left can prefer over the ahead-of-watermark
  *    ones). State per key is O(out-of-orderness), NOT O(history) — the
  *    streaming analogue of the batch merge's one-buffered-row.
  *
  * An event-time timeout re-fires the key when the watermark advances
  * with no new data, so buffered lefts drain without requiring traffic on
  * their key. Emitted matches are final → Append mode.
  *
  * Reference anchor: the validator's "latest state vector visible at this
  * round" read (/root/reference/neurons/validator.py:110,146), here as an
  * unbounded stream instead of an in-place tensor.
  */
object AsOfStream {

  /** One keyed event: `isRight` selects the side; `ts` (event-time, also
    * the watermark column) must equal `timestamp_micros(ts_us)` — `ts_us`
    * stays authoritative so comparisons are exact µs longs. */
  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                      id: Long, isRight: Boolean)
  final case class AsOfMatch(user_id: Long, left_id: Long, left_ts_us: Long,
                             right_id: Option[Long], gap_us: Option[Long])
  /** Buffered per-key state; both vectors stay (ts_us, id)-sorted. */
  final case class AsOfState(lefts: Vector[(Long, Long)],
                             rights: Vector[(Long, Long)])

  def matches(events: Dataset[Ev], allowExact: Boolean = false,
              toleranceUs: Option[Long] = None, outer: Boolean = true)
      : Dataset[AsOfMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[AsOfState]) =>
          val prev = state.getOption.getOrElse(AsOfState(Vector.empty, Vector.empty))
          val arrived = it.toVector
          val lefts = (prev.lefts ++ arrived.filter(!_.isRight)
            .map(e => (e.ts_us, e.id))).sorted
          val rights = (prev.rights ++ arrived.filter(_.isRight)
            .map(e => (e.ts_us, e.id))).sorted
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (due, pending) = lefts.partition(_._1 <= wmUs)
          val out = due.map { case (lt, lid) =>
            // latest admissible right = last in sorted order below the
            // bound; equal-ts ties resolve to max id (the batch exec's
            // tiebreak-last rule)
            val cand = rights.takeWhile(r =>
              if (allowExact) r._1 <= lt else r._1 < lt).lastOption
              .filter(r => toleranceUs.forall(tol => lt - r._1 <= tol))
            AsOfMatch(uid, lid, lt, cand.map(_._2), cand.map(lt - _._1))
          }
          // minimal sufficient right set: all ahead of the watermark plus
          // the single latest at-or-behind it
          val (behind, ahead) = rights.partition(_._1 <= wmUs)
          val keptRights = behind.takeRight(1) ++ ahead
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsOfState(pending, keptRights))
            if (pending.nonEmpty)
              // re-fire as soon as the watermark moves at all (must be
              // strictly ahead of the current watermark by contract)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          }
          (if (outer) out else out.filter(_.right_id.isDefined)).iterator
      }
  }
}
