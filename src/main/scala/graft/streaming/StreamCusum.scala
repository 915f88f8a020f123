package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, ValueState}

/** Streaming twin of `q_cusum` (SURVEY §2.38): the same one-sided CUSUM
  * drift alarm, run as the SEQUENTIAL clipped recursion through
  * `transformWithState` — the online form the batch query's prefix-min
  * identity (S_n ≡ RS_n − min(0, min RS_j)) replaces with two windows.
  * Per key the state is O(1): the running statistic, its peak, the
  * alarm count and first alarm hour. StreamCusumSpec pins
  * batch == stream on a drained MemoryStream, which proves the identity
  * AND the incremental deployment story in one assertion: a monitor
  * can run this processor over an unbounded hourly feed with four
  * longs of state per key and reproduce the batch detector exactly.
  *
  * The reference mean μ = T/n is a calibration constant shipped with
  * each row (the batch query derives it retrospectively from the full
  * series; an online deployment derives it from a calibration window
  * and ships it the same way). All arithmetic is the batch query's
  * exact 4n-scaled BIGINT form: D_i = 4n·cnt − 5T, alarm at S > 8T.
  *
  * Ordering contract: the batch detector folds hours in ascending hr
  * order; within a micro-batch rows are unordered, so the processor
  * sorts each key's slice by hr before folding (WatermarkAudit
  * discipline). Across batches the feed must deliver ascending hours —
  * true of any hourly aggregation feed by construction.
  */
object StreamCusum {

  /** One hourly observation plus the per-key calibration constants. */
  final case class CusumEvent(event_type: String, hr: Long, cnt: Long,
      n: Long, t: Long)

  /** O(1) per-key detector state; firstAlarm = -1 until an alarm. */
  final case class CusumState(s: Long, mx: Long, nHours: Long,
      alarms: Long, firstAlarm: Long)

  /** Update-mode readout per key and micro-batch. */
  final case class CusumRow(event_type: String, n_hours: Long,
      n_alarms: Long, first_alarm_hr: Long, max_stat_scaled: Long)

  class CusumProcessor
      extends StatefulProcessor[String, CusumEvent, CusumRow] {

    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CusumRow] = {
      val evs = rows.toArray.sortBy(_.hr)
      if (evs.isEmpty) return Iterator.empty
      var s = if (st.exists()) st.get()
              else CusumState(0L, 0L, 0L, 0L, -1L)
      evs.foreach { e =>
        val d = 4L * e.n * e.cnt - 5L * e.t
        val next = math.max(0L, s.s + d)
        val alarm = next > 8L * e.t
        s = CusumState(next, math.max(s.mx, next), s.nHours + 1L,
          s.alarms + (if (alarm) 1L else 0L),
          if (alarm && s.firstAlarm < 0L) e.hr else s.firstAlarm)
      }
      st.update(s)
      Iterator.single(CusumRow(key, s.nHours, s.alarms, s.firstAlarm, s.mx))
    }
  }

  /** Incremental per-type CUSUM; latest update-mode row per key is the
    * detector readout.
    */
  def cusum(events: Dataset[CusumEvent]): Dataset[CusumRow] = {
    implicit val rowEnc: Encoder[CusumRow] = Encoders.product[CusumRow]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    events.groupByKey(_.event_type)(strEnc)
      .transformWithState(new CusumProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
