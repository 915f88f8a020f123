package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Structured-Streaming behavior (SURVEY.md §5.2 item 6): watermarked
  * tumbling windows, late-data drop, streaming dedup, session windows,
  * and batch-twin equivalence — all via MemoryStream so a batch of
  * events drives the streaming query synchronously.
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  private def drain(q: StreamingQuery): Unit = { q.processAllAvailable() }

  test("tumbling window with watermark: counts per window, late row dropped") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamingOps.tumbling(
      mem.toDF().withWatermark("ts", "10 minutes"), "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumb").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      mem.addData(
        Ev(1, t(5), 1, "click", 1.0), Ev(2, t(20), 1, "click", 2.0),
        Ev(3, t(70), 2, "view", 3.0))
      drain(q)
      // advance watermark far past hour 10 so its windows finalize
      mem.addData(Ev(4, t(240), 2, "view", 1.0))
      drain(q)
      val out1 = spark.table("tumb")
        .select(col("w.start").cast("string"), col("event_type"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(out1.contains(("2024-01-01 10:00:00", "click", 2L)))
      assert(out1.contains(("2024-01-01 11:00:00", "view", 1L)))
      // late arrival inside the already-finalized hour 10 → dropped
      mem.addData(Ev(5, t(25), 1, "click", 9.0))
      drain(q)
      mem.addData(Ev(6, t(300), 2, "view", 1.0))
      drain(q)
      val clicks10 = spark.table("tumb")
        .filter(col("event_type") === "click" &&
          col("w.start").cast("string") === "2024-01-01 10:00:00")
        .agg(sum("n")).as[Long].collect()
      assert(clicks10.headOption.contains(2L), "late click must not reopen the window")
    } finally q.stop()
  }

  test("streaming dedup by event_id emits each id once") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.dedup(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("dedup").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      mem.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 1, "view", 1.0))
      drain(q)
      mem.addData(Ev(1, t(0), 1, "click", 1.0), Ev(3, t(2), 1, "click", 1.0))
      drain(q)
      val ids = spark.table("dedup").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("session windows: 30m gap merges and splits correctly (stream)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = StreamingOps.sessions(
      mem.toDF().withWatermark("ts", "10 minutes"), "30 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      // user 1: events at 10:00, 10:20 (one session); 11:30 (new session)
      mem.addData(Ev(1, t(0), 1, "a", 1.0), Ev(2, t(20), 1, "a", 1.0),
        Ev(3, t(90), 1, "a", 1.0))
      drain(q)
      mem.addData(Ev(9, t(400), 9, "z", 0.0)) // advance watermark
      drain(q)
      val sess = spark.table("sess")
        .filter(col("user_id") === 1)
        .select(col("w.start").cast("string"), col("w.end").cast("string"), col("n"))
        .as[(String, String, Long)].collect().toSet
      assert(sess.contains(("2024-01-01 10:00:00", "2024-01-01 10:50:00", 2L)))
      assert(sess.contains(("2024-01-01 11:30:00", "2024-01-01 12:00:00", 1L)))
    } finally q.stop()
  }

  test("batch twin equivalence: streaming complete-mode tumbling == batch") {
    implicit val sc = spark.sqlContext
    val evs = Seq(
      Ev(1, t(5), 1, "click", 1.5), Ev(2, t(20), 1, "click", 2.25),
      Ev(3, t(70), 2, "view", 3.0), Ev(4, t(75), 2, "click", 0.5))
    val mem = MemoryStream[Ev]
    val q = StreamingOps.tumbling(mem.toDF(), "1 hour")
      .writeStream.outputMode("complete").format("memory").queryName("twin").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      mem.addData(evs: _*)
      drain(q)
      val streamed = spark.table("twin")
        .select(col("w.start").cast("string"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      val batch = StreamingOps.tumbling(evs.toDF(), "1 hour")
        .select(col("w.start").cast("string"), col("event_type"), col("n"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("incremental json file sink: checkpointed append (reference app/main.py:99-111 upgrade)") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val mem = MemoryStream[Ev]
    val q = StreamingOps.appendJsonSink(mem.toDF(), s"$dir/out", s"$dir/ckpt")
    try {
      mem.addData(Ev(1, t(0), 1, "click", 1.0))
      drain(q)
      mem.addData(Ev(2, t(1), 1, "view", 2.0))
      drain(q)
      val rows = spark.read.json(s"$dir/out").count()
      assert(rows == 2)
    } finally q.stop()
  }

  test("stream-stream join: watermarked interval join == batch twin") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val joined = StreamingOps.clickToPurchase(
      clicks.toDF().withWatermark("ts", "10 minutes"),
      purchases.toDF().withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").option("checkpointLocation", TestSpark.ckpt()).start()
    val cs = Seq(
      Ev(10, t(0), 1, "click", 0), Ev(11, t(25), 1, "click", 0),
      Ev(12, t(50), 1, "click", 0), Ev(13, t(10), 2, "click", 0))
    val ps = Seq(
      Ev(20, t(30), 1, "purchase", 5.0), // joins clicks at t25 (and t0? 30m window: t0 is exactly -30m → included)
      Ev(21, t(90), 2, "purchase", 7.0)) // no click within 30m
    try {
      clicks.addData(cs: _*)
      purchases.addData(ps: _*)
      drain(q)
      // push both watermarks far ahead so all join state finalizes
      clicks.addData(Ev(98, t(500), 9, "click", 0))
      purchases.addData(Ev(99, t(500), 9, "purchase", 0))
      drain(q)
      val stream = spark.table("ssj")
        .filter(col("user_id") =!= 9)
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      val batch = StreamingOps.clickToPurchase(cs.toDF(), ps.toDF())
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(stream === batch)
      assert(stream === Set((20L, 10L), (20L, 11L)))
    } finally q.stop()
  }

  test("windowed top-k: bounded-state ranked readout, incremental == batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val evs = Seq(
      Ev(1, t(5), 1, "click", 5.0), Ev(2, t(10), 1, "view", 9.0),
      Ev(3, t(20), 2, "click", 9.0), Ev(4, t(30), 2, "view", 1.0))
    val agg = StreamingOps.windowedTopK(
      mem.toDF().withWatermark("ts", "10 minutes"), k = 2)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wtopk").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      mem.addData(evs: _*)
      drain(q)
      mem.addData(Ev(9, t(240), 3, "view", 1.0)) // watermark past hour 10
      drain(q)
      val stream = StreamingOps.topKToRows(spark.table("wtopk")
          .filter(col("w.start").cast("string") === "2024-01-01 10:00:00"))
        .select("rank", "event_id", "value")
        .as[(Long, Long, Double)].collect().toList.sortBy(_._1)
      // value tie at 9.0 between ids 2 and 3 → lower id first; k=2
      // cuts the 5.0 and 1.0 rows
      assert(stream == List((1L, 2L, 9.0), (2L, 3L, 9.0)))
      // identical builder on a batch frame must agree row-for-row
      val batch = StreamingOps.topKToRows(
          StreamingOps.windowedTopK(evs.toDF(), k = 2))
        .select("rank", "event_id", "value")
        .as[(Long, Long, Double)].collect().toList.sortBy(_._1)
      assert(batch == stream)
    } finally q.stop()
  }
}
