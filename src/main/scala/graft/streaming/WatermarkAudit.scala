package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, ValueState}

/** Streaming twin of `q_watermark_audit` (SURVEY §2.36): the same
  * per-key high-water-mark lateness audit, run incrementally over the
  * arrival stream through `transformWithState` instead of a batch
  * window. Per key the state is O(1) — the running max event time plus
  * three counters — which is exactly the claim the batch row's
  * "per-key prefix max = one keyed window pass (O(1) state per key in
  * the streaming twin)" makes; StreamingWatermarkAuditSpec pins
  * batch == stream on a drained MemoryStream.
  *
  * Ordering contract: the batch query audits events in (arr_us,
  * event_id) order per user. A stream delivers arrival order across
  * batches by construction; within a micro-batch rows are unordered,
  * so the processor sorts each key's batch slice by the same total
  * order before folding — identical discipline to TwsOps'
  * SessionProcessor.
  */
object WatermarkAudit {

  /** One audited event: event time and (jittered) arrival time, µs. */
  final case class AuditEvent(user_id: Long, event_id: Long,
      e_us: Long, arr_us: Long)

  /** Per-key running audit state — O(1) regardless of event count. */
  final case class AuditState(hwm: Long, n: Long, nLate: Long, maxLateS: Long)

  /** The per-user audit readout (update-mode row, emitted per batch). */
  final case class AuditRow(user_id: Long, n: Long, n_late: Long,
      max_late_s: Long)

  /** 600 s watermark threshold in µs — the batch query's constant. */
  val ThresholdUs: Long = 600000000L

  class AuditProcessor
      extends StatefulProcessor[Long, AuditEvent, AuditRow] {

    @transient private var st: ValueState[AuditState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AuditState]("audit",
        Encoders.product[AuditState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[AuditEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AuditRow] = {
      val evs = rows.toArray.sortBy(e => (e.arr_us, e.event_id))
      if (evs.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get()
              else AuditState(Long.MinValue, 0L, 0L, 0L)
      evs.foreach { e =>
        // lateness is judged against the high-water mark of STRICT
        // predecessors (the batch window's 1-PRECEDING frame), then
        // the mark advances
        val late = s.hwm != Long.MinValue && e.e_us < s.hwm - ThresholdUs
        val lateS =
          if (late) (s.hwm - ThresholdUs - e.e_us) / 1000000L else 0L
        s = AuditState(math.max(s.hwm, e.e_us), s.n + 1L,
          s.nLate + (if (late) 1L else 0L), math.max(s.maxLateS, lateS))
      }
      st.update(s)
      Iterator.single(AuditRow(userId, s.n, s.nLate, s.maxLateS))
    }
  }

  /** Incremental per-user watermark audit; emits the updated per-key
    * readout each micro-batch (update semantics — the latest row per
    * key is the audit).
    */
  def audit(events: Dataset[AuditEvent]): Dataset[AuditRow] = {
    implicit val rowEnc: Encoder[AuditRow] = Encoders.product[AuditRow]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)(longEnc)
      .transformWithState(new AuditProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
