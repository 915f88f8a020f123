package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}
import graft.streaming.WatermarkAudit
import graft.streaming.WatermarkAudit.{AuditEvent, AuditRow}

/** VERDICT r12 #8: the streaming twin of q_watermark_audit — the same
  * per-key high-water-mark lateness audit through transformWithState,
  * pinned batch == stream on a drained MemoryStream (the TwsSessionSpec
  * precedent). Closes the §2.9 measurement gap for the r12 audit key.
  */
class StreamingWatermarkAuditSpec extends AnyFunSuite {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("tws watermark audit equals the batch q_watermark_audit on the same events") {
    TestSpark.withConf("spark.sql.streaming.stateStore.providerClass" -> Provider) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      // batch truth: the declared query itself
      val batch = SparkEntry.queries("q_watermark_audit")(spark, sf).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("n_late"),
            r.getAs[Long]("max_late_s"))))
        .toMap

      // the same events, with the query's own jitter formula, fed to
      // the stream in GLOBAL arrival order split over three
      // micro-batches (a stream delivers arrival order by construction)
      val evs = graft.core.Tables.events(spark, sf)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("e_us"))
        .withColumn("arr_us",
          col("e_us")
            + (((col("event_id") % 997) * 2654435761L) % 997) * 1000000L)
        .as[AuditEvent].collect().sortBy(e => (e.arr_us, e.event_id))
      assert(evs.length > 100)

      val input = MemoryStream[AuditEvent]
      val q = WatermarkAudit.audit(input.toDS())
        .writeStream.format("memory").queryName("wm_audit_out")
        .outputMode("update").option("checkpointLocation", TestSpark.ckpt()).start()
      try {
        evs.grouped((evs.length + 2) / 3).foreach { chunk =>
          input.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        // update mode appends a fresh row per (key, batch); the audit
        // is the row with the highest n per key (n is monotone)
        val streamed = spark.table("wm_audit_out").as[AuditRow].collect()
          .groupBy(_.user_id)
          .map { case (u, rows) =>
            val last = rows.maxBy(_.n)
            u -> ((last.n, last.n_late, last.max_late_s))
          }
        assert(streamed == batch,
          s"stream != batch; stream-only=${streamed.toSet -- batch.toSet} " +
            s"batch-only=${batch.toSet -- streamed.toSet}")
        assert(streamed.nonEmpty)
      } finally q.stop()
    }
  }

  test("tws watermark audit is incremental: per-key state survives batch boundaries") {
    TestSpark.withConf("spark.sql.streaming.stateStore.providerClass" -> Provider) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[AuditEvent]
      val q = WatermarkAudit.audit(input.toDS())
        .writeStream.format("memory").queryName("wm_audit_incr")
        .outputMode("update").option("checkpointLocation", TestSpark.ckpt()).start()
      try {
        // batch 1 raises the high-water mark to 10_000 s
        input.addData(AuditEvent(7L, 1L, 10000000000L, 1000L))
        q.processAllAvailable()
        // batch 2's event time sits 700 s behind the mark: late by 100 s
        // ONLY if the mark survived the batch boundary
        input.addData(AuditEvent(7L, 2L, 9300000000L, 2000L))
        q.processAllAvailable()
        val rows = spark.table("wm_audit_incr").as[AuditRow].collect()
        val last = rows.filter(_.user_id == 7L).maxBy(_.n)
        assert(last == AuditRow(7L, 2L, 1L, 100L), s"got $last")
      } finally q.stop()
    }
  }
}
