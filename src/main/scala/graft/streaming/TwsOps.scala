package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import StatefulOps.{ClosedSession, OpenSession, SessionEvent}

/** The Spark-4 `transformWithState` twin of
  * [[StatefulOps.userSessions]] — the arbitrary-stateful-processing
  * API that succeeds `flatMapGroupsWithState`: typed state handles
  * (`ValueState`/`ListState`/`MapState`, each with optional TTL),
  * EXPLICIT event-time timers (register/delete — fMGWS allows exactly
  * one implicit timeout per key), and a lifecycle (`init`/
  * `handleInputRows`/`handleExpiredTimer`) that supports several state
  * variables per key. RocksDB state store required by the operator.
  *
  * Semantics here are kept bit-identical to the fMGWS sessionizer —
  * one open session per key, gap-merge within the sorted batch,
  * timer fires when the watermark passes last event + gap —
  * and TwsSessionSpec proves output equality on the same input. At
  * 100 TB the shape is unchanged: state partitioned by key in the
  * executor store, O(1) per key, timers garbage-collect idle keys.
  */
object TwsOps {

  /** One open session per key in a ValueState; one registered timer at
    * `last event + gap` (deleted and re-registered as the session
    * extends — TWS timers are not auto-replaced like fMGWS timeouts).
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {

    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    private def close(userId: Long, s: OpenSession): ClosedSession =
      ClosedSession(userId, s.startUs, s.lastUs + gapMs * 1000L, s.n, s.sum)

    override def handleInputRows(userId: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      // within-batch events are unordered: sort, then gap-split (the
      // exact fMGWS discipline — StatefulOps.userSessions)
      val evs = rows.toArray.sortBy(e => (e.ts.getTime, e.value))
      if (evs.isEmpty) return Iterator.empty
      var cur = if (open.exists()) Some(open.get()) else None
      // the open session's timer moves with its last event: drop the
      // old registration before extending
      cur.foreach(s => getHandle.deleteTimer(s.lastUs / 1000L + gapMs))
      val closed = Seq.newBuilder[ClosedSession]
      evs.foreach { e =>
        val us = e.ts.getTime * 1000L
        cur match {
          case Some(s) if us - s.lastUs <= gapMs * 1000L =>
            cur = Some(OpenSession(s.startUs, math.max(s.lastUs, us),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(userId, s)
            cur = Some(OpenSession(us, us, 1, e.value))
          case None =>
            cur = Some(OpenSession(us, us, 1, e.value))
        }
      }
      cur.foreach { s =>
        open.update(s)
        getHandle.registerTimer(s.lastUs / 1000L + gapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
      // watermark passed last+gap: emit the open session, drop state
      val out =
        if (open.exists()) Iterator.single(close(userId, open.get()))
        else Iterator.empty
      open.clear()
      out
    }
  }

  /** Incremental per-user sessionization, `session_window`-equivalent
    * (session end = last event + gap), emitted once on close.
    */
  def userSessions(events: Dataset[SessionEvent],
      gapMs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc: Encoder[ClosedSession] =
      Encoders.product[ClosedSession]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)(longEnc)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
