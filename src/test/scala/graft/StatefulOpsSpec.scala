package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{ClosedSession, SessionEvent}

/** flatMapGroupsWithState sessionizer: incremental emission across
  * triggers, event-time timeout closing, and equivalence with the
  * built-in session_window on a drained stream.
  */
class StatefulOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // base offset keeps event times well above the initial watermark
  // (epoch 0): an event AT the watermark would be dropped as late
  private val base = 1000000L
  private def ts(min: Long): Timestamp = new Timestamp((base + min) * 60000L)
  private def us(min: Long): Long = (base + min) * 60000000L
  private val gapMs = 30L * 60000L // 30 minutes

  test("sessions close on gap within a batch and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val withWm = input.toDS()
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes").as[SessionEvent]
    val out = StatefulOps.userSessions(withWm, gapMs)
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      // user 1: two events 10m apart (one session), then a 40m gap →
      // in-batch split closes the first session; user 2: single event
      input.addData(
        SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(10), 2.0),
        SessionEvent(1L, ts(50), 4.0), SessionEvent(2L, ts(5), 8.0))
      q.processAllAvailable()
      val afterBatch1 = spark.table("sess_out").as[ClosedSession].collect().toSet
      assert(afterBatch1.contains(ClosedSession(1L, us(0), us(10 + 30), 2L, 3.0)),
        s"got $afterBatch1")

      // advance the watermark far past last+gap: open sessions time out
      input.addData(SessionEvent(3L, ts(500), 0.5))
      q.processAllAvailable()
      input.addData(SessionEvent(3L, ts(501), 0.5))
      q.processAllAvailable()
      val afterTimeout = spark.table("sess_out").as[ClosedSession].collect().toSet
      assert(afterTimeout.contains(ClosedSession(1L, us(50), us(50 + 30), 1L, 4.0)),
        s"got $afterTimeout")
      assert(afterTimeout.contains(ClosedSession(2L, us(5), us(5 + 30), 1L, 8.0)),
        s"got $afterTimeout")
    } finally q.stop()
  }

  test("drained-stream equivalence with built-in session_window") {
    import spark.implicits._
    val evs = Seq(
      SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(20), 1.0),
      SessionEvent(1L, ts(60), 2.0), SessionEvent(2L, ts(0), 3.0),
      SessionEvent(2L, ts(29), 1.0), SessionEvent(2L, ts(58), 1.0),
      SessionEvent(3L, ts(100), 9.0))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val withWm = input.toDS()
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "0 seconds").as[SessionEvent]
    val q = StatefulOps.userSessions(withWm, gapMs)
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      // a far-future event pushes the watermark past every open session
      input.addData(SessionEvent(99L, ts(10000), 0.0))
      q.processAllAvailable()
      input.addData(SessionEvent(99L, ts(10001), 0.0))
      q.processAllAvailable()
      val custom = spark.table("sess_eq").as[ClosedSession].collect()
        .filter(_.user_id != 99L).map(c => (c.user_id, c.ws_us, c.we_us, c.n, c.sum_value)).toSet

      val builtin = evs.toDS()
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("user_id"), unix_micros(col("w.start")).as("ws"),
          unix_micros(col("w.end")).as("we"), col("n"), col("sum_value"))
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(custom === builtin)
    } finally q.stop()
  }
}
