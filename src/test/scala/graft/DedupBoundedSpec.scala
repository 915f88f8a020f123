package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** `dropDuplicatesWithinWatermark` semantics: duplicates within the
  * watermark delay are dropped AND an id's dedup state is freed once
  * the watermark passes it — proven here behaviorally (a far-later
  * re-arrival of an expired id is emitted again) and by the state-row
  * count dropping. Plain dropDuplicates(id) would hold every id
  * forever and suppress the re-arrival.
  */
class DedupBoundedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("bounded dedup: in-window dups dropped, expired ids evicted and re-emitted") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.dedupBounded(
      mem.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("append").format("memory").queryName("dedupb").option("checkpointLocation", TestSpark.ckpt()).start()
    try {
      mem.addData(Ev(1, t(0), 1, "click", 1.0), Ev(2, t(1), 1, "view", 1.0),
        Ev(1, t(2), 1, "click", 1.0)) // dup of id 1 within the delay
      q.processAllAvailable()
      assert(spark.table("dedupb").count() == 2)
      val stateLoaded = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateLoaded >= 2)
      // advance the watermark far past id 1/2's expiry...
      mem.addData(Ev(99, t(600), 9, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(98, t(610), 9, "click", 1.0))
      q.processAllAvailable()
      // ...then REPLAY id 1 with a fresh in-watermark timestamp: its
      // state was evicted, so it's emitted again (bounded state is
      // observable, not just a metric)
      mem.addData(Ev(1, t(605), 1, "click", 1.0))
      q.processAllAvailable()
      val ids = spark.table("dedupb").select("event_id").as[Long].collect().sorted
      assert(ids.count(_ == 1L) == 2, s"expired id must re-emit: ${ids.toSeq}")
      // exactly the unexpired survivors may remain (ids 99, 98, 1') —
      // unbounded dropDuplicates semantics would hold all five ids
      val stateNow = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateNow <= 3,
        s"state must hold only unexpired ids: $stateLoaded -> $stateNow")
    } finally q.stop()
  }
}
