package graft

import java.nio.file.{Files, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The §2.9 closing soak (VERDICT r8 item 8): an AvailableNow drain of a
  * MULTI-BATCH file landing zone through a watermarked window aggregate
  * on a REAL RocksDB state store, asserting the property that decides
  * whether the pipeline survives 100 TB of arrivals — state size is
  * bounded by the windows still open under the watermark, NOT by how
  * many batches have ever flowed through. The earlier specs each prove
  * one leg (AvailableNowSpec: file-source exactly-once, stateless;
  * RocksDBStateSpec: eviction, MemoryStream); this one runs the
  * production composition end-to-end: files → maxFilesPerTrigger-paced
  * micro-batches → RocksDB windowed agg → eviction across a long run.
  *
  * Design: 8 generated file batches, each one hour of event time later
  * than the last, 600 events over 200 users per batch. Watermark 30 min,
  * window 1 h ⇒ at any micro-batch at most ~2 hour-windows × 200 users
  * are live; everything older is finalized + evicted. If eviction broke,
  * state after batch 8 would hold all 8×200 window-rows.
  */
class StreamingSoakSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val schema = StructType.fromDDL("ts TIMESTAMP, user_id BIGINT, amount DOUBLE")

  test("AvailableNow file soak on RocksDB: bounded state across 8 hour-batches") {
    TestSpark.withConf(
      "spark.sql.streaming.stateStore.providerClass" -> Provider) {
      val base = Files.createTempDirectory("graft_soak").toString
      val in = s"$base/in"; val ckpt = s"$base/ckpt"
      Files.createDirectories(Paths.get(in))

      // batch b: hour 10+b, users 1..200, 3 events each on distinct minutes
      def writeBatch(b: Int): Unit = {
        val rows = for (u <- 1 to 200; i <- 0 until 3) yield {
          val h = 10 + b
          f"""{"ts":"2024-01-01 $h%02d:${(u * 3 + i) % 60}%02d:00","user_id":$u,"amount":1.0}"""
        }
        val f = Paths.get(in, f"batch_$b%02d.json")
        Files.write(f, rows.mkString("", "\n", "\n").getBytes)
        // FileStreamSource drains oldest-mtime-first; files written
        // within the same clock tick tie and the tiebreak is listing
        // order, so a later-hour file can jump ahead, advance the
        // watermark, and make the earlier hours "late" (observed once
        // in a full-suite run: hour 11 dropped entirely). Explicit
        // strictly-increasing mtimes pin the intended arrival order.
        Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + b * 60000L))
      }
      (0 until 8).foreach(writeBatch)

      val stateRows = ArrayBuffer.empty[Long]
      val agg = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // one file batch per micro-batch
        .json(in)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("amount")).as("amt"))
        .select(col("window.start").as("w"), col("user_id"), col("n"), col("amt"))
      val q = agg.writeStream.outputMode("append").format("memory")
        .queryName("soak").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try {
        assert(q.awaitTermination(180000), "AvailableNow soak must stop on its own")
        q.recentProgress.foreach { p =>
          if (p.stateOperators.nonEmpty && p.numInputRows > 0)
            stateRows += p.stateOperators(0).numRowsTotal
        }
        assert(q.recentProgress.exists(_.json.contains("rocksdb")),
          "progress metrics show no rocksdb — provider not engaged")
      } finally q.stop()

      // paced as intended: ≥8 data-bearing micro-batches were observed
      assert(stateRows.size >= 8, s"expected >=8 data micro-batches, saw ${stateRows.size}")
      // THE soak property: max live state ≤ 2 open hour-windows × 200
      // users (+ slack for a watermark-lag batch), never the 1600
      // window-rows that ever existed. Growth ⇒ eviction is broken.
      assert(stateRows.max <= 600,
        s"state not bounded by open windows: per-batch rows = ${stateRows.mkString(",")}")
      assert(stateRows.last <= 600,
        s"final state must only hold un-finalized windows: ${stateRows.last}")

      // exactly-once across the drain: hours 10..15 are certainly
      // finalized (hours 16-17 need a trailing watermark-only batch the
      // AvailableNow drain is not obliged to run), each with 200 users
      // × n=3
      val out = spark.table("soak")
      val perHour = out.groupBy(col("w")).agg(count(lit(1)).as("users"),
        sum(col("n")).as("events")).collect()
        .map(r => r.getTimestamp(0).toString -> (r.getLong(1), r.getLong(2))).toMap
      val finalized = (0 until 6).map(b => f"2024-01-01 ${10 + b}%02d:00:00.0")
      finalized.foreach { h =>
        assert(perHour.get(h).contains((200L, 600L)),
          s"hour $h expected (200 users, 600 events), got ${perHour.get(h)}")
      }
      assert(out.groupBy("w", "user_id").count().filter(col("count") > 1).count() == 0,
        "duplicate (window,user) emissions — append-mode exactly-once violated")
    }
  }
}
