package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** State-store hardening (SURVEY.md §7.4 item 5 — the 100 TB streaming
  * risk is state size, not throughput). The default HDFS-backed store
  * keeps every state row on the JVM heap; at web-scale key cardinality
  * that's an OOM. RocksDB spills state off-heap/on-disk and is the
  * production configuration. This spec proves, against a real RocksDB
  * store:
  *   - the provider actually engages (rocksdb metrics in progress),
  *   - results match the default-store semantics,
  *   - watermark advance EVICTS finalized-window state (bounded state,
  *     not append-only growth) at thousands-of-keys cardinality.
  */
class RocksDBStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("watermarked agg on RocksDB: correct results + state evicted on watermark advance") {
    TestSpark.withConf("spark.sql.streaming.stateStore.providerClass" -> Provider) {
    implicit val sc = spark.sqlContext
    locally {
      val mem = MemoryStream[Ev]
      val agg = mem.toDF().withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName("rocks").option("checkpointLocation", TestSpark.ckpt()).start()
      try {
        def t(min: Int): Timestamp =
          Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
        // 3000 distinct users in hour 10 — state cardinality that matters
        val users = (1L to 3000L)
        mem.addData(users.map(u => Ev(u, t((u % 50).toInt), u, "click", 1.0)): _*)
        q.processAllAvailable()
        val afterLoad = q.lastProgress.stateOperators(0).numRowsTotal
        assert(afterLoad >= 3000L, s"expected >=3000 state rows, got $afterLoad")
        assert(q.lastProgress.json.contains("rocksdb"),
          "progress metrics show no rocksdb — provider not engaged")
        // advance the watermark far past hour 10: all 3000 windows
        // finalize, emit, and their state rows must be REMOVED
        mem.addData(Ev(999999L, t(600), 999999L, "click", 1.0))
        q.processAllAvailable()
        mem.addData(Ev(999998L, t(610), 999998L, "click", 1.0))
        q.processAllAvailable()
        val afterEvict = q.lastProgress.stateOperators(0).numRowsTotal
        assert(afterEvict < 100L,
          s"watermark advance must evict finalized state: $afterLoad -> $afterEvict")
        // and the emitted results are the correct per-user counts
        val out = spark.table("rocks").filter(col("user_id") <= 3000L)
        assert(out.count() == 3000L)
        assert(out.filter(col("n") =!= 1L).count() == 0L)
      } finally q.stop()
    }
    }
  }
}
