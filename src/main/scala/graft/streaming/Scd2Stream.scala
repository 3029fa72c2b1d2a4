package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the SCD TYPE-2 dimension build (`queries/
  * EventQueries` y41): per-user event-type CHANGES detected against the
  * last watermark-finalized event, emitted exactly once — either as
  * change points (`changes`, the store-ingest shape: a change's
  * valid_from is its own event time, final the moment it folds) or as
  * CLOSED validity intervals (`closedIntervals`: an interval emits when
  * the change that closes it folds; the still-open interval is state,
  * not output — Append mode cannot revise rows, and "current" rows are
  * by definition revisable).
  *
  * Correctness argument (the FunnelStream/RetentionStream discipline):
  * events fold only when STRICTLY below the watermark, in (ts, event_id)
  * order — the batch window's exact order — so the "previous event
  * type" each fold compares against is the same value the batch lag
  * sees, out-of-order delivery notwithstanding. State per user: the
  * out-of-orderness buffer plus (last type, open-interval start) — two
  * scalars, never the event history.
  *
  * Reference semantics: the validator's continuously maintained
  * per-miner state across steps (neurons/validator.py:146-170),
  * re-expressed as the warehouse dimension-maintenance cadence.
  */
object Scd2Stream {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
                      event_id: Long, event_type: String)
  /** `change_seq` is the user's 0-based change ordinal IN FOLD ORDER —
    * the deterministic tie-break a store reader's lead window needs:
    * two changes can share `valid_from_us` (same-microsecond events of
    * different types, ordered by event_id), and a window ordered by
    * time alone would reconstruct their intervals in shuffle order. */
  final case class Change(user_id: Long, state: String, valid_from_us: Long,
                          change_seq: Long)
  final case class ClosedInterval(user_id: Long, state: String,
                                  valid_from_us: Long, valid_to_us: Long)
  final case class St(buffer: Vector[(Long, Long, String)],
                      lastType: Option[String], openFrom: Option[Long],
                      nChanges: Long)

  /** The shared fold: one state machine, two output shapes. `onChange`
    * sees (uid, the open interval if any, the new type, its time, the
    * change ordinal) at every type change — including the user's first
    * event. */
  private def run[T: Encoder](events: Dataset[Ev])(
      onChange: (Long, Option[(String, Long)], String, Long, Long) => Option[T])
      : Dataset[T] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[St, T](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[St]) =>
          val prev = state.getOption
            .getOrElse(St(Vector.empty, None, None, 0L))
          val buf = prev.buffer ++
            it.map(e => (e.ts_us, e.event_id, e.event_type))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // strictly below the watermark (the FunnelStream rule): an
          // event AT the watermark is still admissible later and could
          // sort before a not-yet-arrived same-time peer
          val (due, pending) = buf.partition(_._1 < wmUs)
          var lastType = prev.lastType
          var openFrom = prev.openFrom
          var nChanges = prev.nChanges
          val out = Vector.newBuilder[T]
          for ((tus, _, tpe) <- due.sortBy(t => (t._1, t._2))) {
            if (!lastType.contains(tpe)) {
              val open = for { lt <- lastType; of <- openFrom } yield (lt, of)
              onChange(uid, open, tpe, tus, nChanges).foreach(out += _)
              openFrom = Some(tus)
              nChanges += 1
            }
            lastType = Some(tpe)
          }
          if (pending.isEmpty && lastType.isEmpty) state.remove()
          else {
            state.update(St(pending.sortBy(t => (t._1, t._2)),
              lastType, openFrom, nChanges))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1L)
          }
          out.result().iterator
      }
  }

  /** Finalized CHANGE POINTS — the dimension-store ingest stream: each
    * (user, state, valid_from, change_seq) row is final when emitted
    * (its time is its own; later events cannot precede the watermark),
    * so a plain append sink accumulates the full change history and a
    * per-user lead window ORDERED BY change_seq over that compact store
    * reconstructs the dimension — closed intervals AND the current
    * NULL-valid_to row — deterministically even through same-time
    * changes. */
  def changes(events: Dataset[Ev]): Dataset[Change] = {
    implicit val enc: Encoder[Change] =
      org.apache.spark.sql.Encoders.product[Change]
    run(events) { (uid, _, tpe, tus, seq) =>
      Some(Change(uid, tpe, tus, seq))
    }
  }

  /** CLOSED validity intervals, emitted exactly once as each closing
    * change folds. The open (current) interval stays in state — it is
    * the one row of the batch form a revision-free stream cannot emit. */
  def closedIntervals(events: Dataset[Ev]): Dataset[ClosedInterval] = {
    implicit val enc: Encoder[ClosedInterval] =
      org.apache.spark.sql.Encoders.product[ClosedInterval]
    run(events) { (uid, open, _, tus, _) =>
      open.map { case (st, from) => ClosedInterval(uid, st, from, tus) }
    }
  }
}
