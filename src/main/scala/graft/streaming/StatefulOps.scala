package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.10
  * UDAF row → "custom state" path; builder contract: `KeyValueGrouped
  * Dataset.mapGroupsWithState/flatMapGroupsWithState for custom state`).
  *
  * [[StatefulOps.userSessions]] is an incremental sessionizer with
  * *explicit* state — the hand-rolled twin of `session_window` — for
  * session semantics the built-in can't express (e.g. emitting the
  * session only once, on close, with a per-session event cap or custom
  * merge logic). State per key is one open session (constant size);
  * event-time timeouts close sessions when the watermark passes
  * `last event + gap`, so state is bounded exactly like the built-in's.
  *
  * Scale: state lives in the executor state store partitioned by
  * user_id — no driver involvement; per-key state is O(1); timeouts
  * garbage-collect idle keys. This is the 100 TB-safe shape for custom
  * streaming state.
  */
object StatefulOps {

  case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

  /** One open session per user (the only state kept). */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, sum: Double)

  /** Emitted once, when the session closes (gap elapsed or timeout). */
  case class ClosedSession(user_id: Long, ws_us: Long, we_us: Long,
      n: Long, sum_value: Double)

  /** Incremental per-user sessionization with `gap` inactivity timeout.
    * Semantics match `session_window(ts, gap)`: session end = last
    * event + gap; events ≤ gap apart merge.
    */
  def userSessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong

    def fn(userId: Long, batch: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      def close(s: OpenSession) =
        ClosedSession(userId, s.startUs, s.lastUs + gapMs * 1000L, s.n, s.sum)

      if (batch.isEmpty && state.hasTimedOut) {
        // watermark passed last+gap: emit the open session and drop state
        val out = state.getOption.map(close).iterator
        state.remove()
        return out
      }
      // within-batch events are unordered: sort, then gap-split
      val evs = batch.toArray.sortBy(e => (e.ts.getTime, e.value))
      var open = state.getOption
      val closed = Seq.newBuilder[ClosedSession]
      evs.foreach { e =>
        val us = e.ts.getTime * 1000L
        open match {
          case Some(s) if us - s.lastUs <= gapMs * 1000L =>
            open = Some(OpenSession(s.startUs, math.max(s.lastUs, us),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(s)
            open = Some(OpenSession(us, us, 1, e.value))
          case None =>
            open = Some(OpenSession(us, us, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close when the watermark passes last event + gap
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapMs)
      }
      closed.result().iterator
    }

    events.groupByKey(_.user_id)(longEnc)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
