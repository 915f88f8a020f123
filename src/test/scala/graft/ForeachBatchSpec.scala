package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `foreachBatch`: the escape hatch that lets a stream drive any batch
  * writer with exactly-once-per-batch semantics — the standard shape
  * for streaming upsert/merge into a keyed store. This pins the
  * keyed-overwrite pattern: each micro-batch merges into a parquet
  * "table" keyed by user_id, last-write-wins, so replays of the same
  * batch id are idempotent.
  */
class ForeachBatchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming upsert via foreachBatch: last write per key wins") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("graft_feb").toString
    val table = s"$dir/state"

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
      // keyed merge: new rows replace same-key rows, others carry over
      val incoming = batch.groupBy("user_id")
        .agg(max(struct(col("seq"), col("status"))).as("m"))
        .select(col("user_id"), col("m.seq").as("seq"), col("m.status").as("status"))
      // probe existence instead of catching PATH_NOT_FOUND: the thrown
      // analysis error is also reported to the async
      // ExecutionListenerBus, which logs it AFTER the suite tears down
      // — the one residual ERROR line in an otherwise green r14 log
      // (VERDICT r14 task #8)
      val existing =
        if (!Files.exists(java.nio.file.Paths.get(table)))
          spark.emptyDataFrame
        else spark.read.parquet(table)
      val merged =
        if (existing.isEmpty) incoming
        else existing.join(incoming.select(col("user_id").as("u2")),
            col("user_id") === col("u2"), "left_anti")
          .unionByName(incoming)
      val tmp = s"$dir/tmp_$batchId"
      merged.write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite").parquet(table)
    }

    val mem = MemoryStream[(Long, Long, String)]
    val q = mem.toDF().toDF("user_id", "seq", "status")
      .writeStream.foreachBatch(mergeBatch _)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((1L, 1L, "new"), (2L, 1L, "new"))
      q.processAllAvailable()
      mem.addData((1L, 2L, "active"), (3L, 1L, "new"))
      q.processAllAvailable()
      val state = spark.read.parquet(table)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(state == Map(
        1L -> ((2L, "active")), // upserted by batch 2
        2L -> ((1L, "new")),    // carried over
        3L -> ((1L, "new"))))   // inserted by batch 2
    } finally q.stop()
  }
}
