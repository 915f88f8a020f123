package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}
import graft.streaming.StreamCusum
import graft.streaming.StreamCusum.{CusumEvent, CusumRow}

/** Streaming twin of q_cusum (§2.9 pattern, StreamingWatermarkAuditSpec
  * precedent): the sequential clipped recursion through
  * transformWithState must equal the batch query's prefix-min window
  * form on the same hourly series — one assertion proving both the
  * window identity and the O(1)-state online deployment story.
  */
class StreamCusumSpec extends AnyFunSuite {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("tws CUSUM equals the batch q_cusum on the same hourly series") {
    TestSpark.withConf("spark.sql.streaming.stateStore.providerClass" -> Provider) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext

      val batch = SparkEntry.queries("q_cusum")(spark, sf).collect()
        .map(r => r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n_hours"), r.getAs[Long]("n_alarms"),
            Option(r.getAs[java.lang.Long]("first_alarm_hr"))
              .map(_.toLong).getOrElse(-1L))))
        .toMap

      // the hourly series + calibration constants the batch query derives
      val hourExpr =
        "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val h = graft.core.Tables.events(spark, sf)
        .groupBy(col("event_type"), expr(hourExpr).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val tot = h.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cnt").as("t"))
      val evs = h.join(tot, "event_type")
        .select(col("event_type"), col("hr"), col("cnt"), col("n"), col("t"))
        .as[CusumEvent].collect().sortBy(_.hr)

      val input = MemoryStream[CusumEvent]
      val q = StreamCusum.cusum(input.toDS())
        .writeStream.format("memory").queryName("cusum_out")
        .outputMode("update").option("checkpointLocation", TestSpark.ckpt()).start()
      try {
        evs.grouped((evs.length + 2) / 3).foreach { chunk =>
          input.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        val streamed = spark.table("cusum_out").as[CusumRow].collect()
          .groupBy(_.event_type)
          .map { case (k, rows) =>
            val last = rows.maxBy(_.n_hours)
            k -> ((last.n_hours, last.n_alarms, last.first_alarm_hr))
          }
        assert(streamed == batch,
          s"stream $streamed\nbatch  $batch")
      } finally q.stop()
    }
  }
}
