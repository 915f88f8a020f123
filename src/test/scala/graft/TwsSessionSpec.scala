package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StatefulOps, TwsOps}
import graft.streaming.StatefulOps.{ClosedSession, SessionEvent}

/** transformWithState sessionizer (Spark 4 arbitrary stateful
  * processing, RocksDB-backed): incremental emission across triggers,
  * explicit event-time timers closing sessions, and bit-identical
  * output to the flatMapGroupsWithState twin on the same drained
  * stream — the migration guarantee for moving custom state off the
  * legacy API.
  */
class TwsSessionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val base = 1000000L
  private def ts(min: Long): Timestamp = new Timestamp((base + min) * 60000L)
  private def us(min: Long): Long = (base + min) * 60000000L
  private val gapMs = 30L * 60000L

  test("tws sessions close on in-batch gap and on timer expiry") {
    TestSpark.withConf("spark.sql.streaming.stateStore.providerClass" -> Provider) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[SessionEvent]
      val withWm = input.toDS()
        .withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes").as[SessionEvent]
      val q = TwsOps.userSessions(withWm, gapMs)
        .writeStream.format("memory").queryName("tws_out")
        .outputMode("append").option("checkpointLocation", TestSpark.ckpt()).start()
      try {
        input.addData(
          SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(10), 2.0),
          SessionEvent(1L, ts(50), 4.0), SessionEvent(2L, ts(5), 8.0))
        q.processAllAvailable()
        val afterBatch1 = spark.table("tws_out").as[ClosedSession].collect().toSet
        assert(afterBatch1.contains(ClosedSession(1L, us(0), us(10 + 30), 2L, 3.0)),
          s"got $afterBatch1")

        // advance the watermark far past last+gap: timers fire
        input.addData(SessionEvent(3L, ts(500), 0.5))
        q.processAllAvailable()
        input.addData(SessionEvent(3L, ts(501), 0.5))
        q.processAllAvailable()
        val afterTimer = spark.table("tws_out").as[ClosedSession].collect().toSet
        assert(afterTimer.contains(ClosedSession(1L, us(50), us(50 + 30), 1L, 4.0)),
          s"got $afterTimer")
        assert(afterTimer.contains(ClosedSession(2L, us(5), us(5 + 30), 1L, 8.0)),
          s"got $afterTimer")
      } finally q.stop()
    }
  }

  test("tws and fMGWS sessionizers emit identical sessions on the same input") {
    TestSpark.withConf("spark.sql.streaming.stateStore.providerClass" -> Provider) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val evs = Seq(
        SessionEvent(1L, ts(0), 1.0), SessionEvent(1L, ts(20), 1.0),
        SessionEvent(1L, ts(60), 2.0), SessionEvent(2L, ts(0), 3.0),
        SessionEvent(2L, ts(29), 1.0), SessionEvent(2L, ts(58), 1.0),
        SessionEvent(3L, ts(100), 9.0))
      def drain(name: String,
          mk: org.apache.spark.sql.Dataset[SessionEvent] =>
            org.apache.spark.sql.Dataset[ClosedSession]): Set[ClosedSession] = {
        val input = MemoryStream[SessionEvent]
        val withWm = input.toDS()
          .withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "0 seconds").as[SessionEvent]
        val q = mk(withWm).writeStream.format("memory").queryName(name)
          .outputMode("append").option("checkpointLocation", TestSpark.ckpt()).start()
        try {
          input.addData(evs: _*)
          q.processAllAvailable()
          // two far-future batches push the watermark past every open
          // session so timers/timeouts fire
          input.addData(SessionEvent(99L, ts(10000), 0.0))
          q.processAllAvailable()
          input.addData(SessionEvent(99L, ts(10001), 0.0))
          q.processAllAvailable()
          spark.table(name).as[ClosedSession].collect()
            .filterNot(_.user_id == 99L).toSet
        } finally q.stop()
      }
      val tws = drain("tws_eq", ds => TwsOps.userSessions(ds, gapMs))
      val fmgws = drain("fmgws_eq", ds => StatefulOps.userSessions(ds, gapMs))
      assert(tws == fmgws, s"tws=$tws\nfmgws=$fmgws")
      assert(tws.nonEmpty)
    }
  }
}
