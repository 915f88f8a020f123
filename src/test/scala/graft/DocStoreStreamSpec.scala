package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming read of the docstore commit log (the Delta streaming-
  * source shape): the manifest version IS the offset, each micro-batch
  * plans exactly the files ADDED between two versions, restart resumes
  * from the checkpointed version, and non-append commits fail loudly
  * unless ignoreChanges opts into re-emission. This is the ingestion
  * seam that lets a 100 TB pipeline TAIL its own corpus store —
  * downstream index maintenance (StreamingIvfRefreshSpec) and dedup
  * (StreamMinhash) consume exactly this kind of feed.
  */
class DocStoreStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** Drain all available micro-batches through foreachBatch (the
    * checkpoint-recoverable sink); returns the (k, v) rows THIS drain
    * emitted — restart semantics read directly off the buffer.
    */
  private def drain(dir: String, checkpoint: String,
      ignoreChanges: Boolean = false): Seq[(Long, Long)] = {
    val rows = ArrayBuffer.empty[(Long, Long)]
    var reader = spark.readStream.format("docstore")
    if (ignoreChanges) reader = reader.option("ignoreChanges", "true")
    val q = reader.load(dir)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    rows.synchronized(rows.toSeq)
  }

  test("appends flow through; restart resumes from the checkpointed version") {
    val dir = tmp("gds_stream")
    val ckpt = tmp("gds_stream_ckpt")
    spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.format("docstore").mode("overwrite").save(dir)

    // first drain: the whole current snapshot is the initial batch
    val got1 = drain(dir, ckpt)
    assert(got1.map(_._1).sorted == (0L until 100L),
      "initial load must emit the full snapshot")

    // two append commits while the stream is DOWN; restart picks up
    // exactly the new files (offset = checkpointed manifest version)
    spark.range(100, 150).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.format("docstore").mode("append").save(dir)
    spark.range(150, 180).select(col("id").as("k"), (col("id") * 2).as("v"))
      .write.format("docstore").mode("append").save(dir)
    val got2 = drain(dir, ckpt)
    assert(got2.map(_._1).sorted == (100L until 180L),
      s"restart must emit ONLY the appended rows, got ${got2.length}")

    // nothing new: an idle drain emits nothing
    assert(drain(dir, ckpt).isEmpty)
  }

  test("non-append commit fails loudly; ignoreChanges re-emits rewritten files") {
    val dir = tmp("gds_stream_rw")
    val ckpt = tmp("gds_stream_rw_ckpt")
    spark.range(200).select(col("id").as("k"), (col("id") * 3).as("v"))
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
      .write.format("docstore").mode("overwrite").save(dir)
    drain(dir, ckpt) // consume the initial snapshot

    // a MERGE rewrites one low-range file — a non-append commit
    sources.DocStoreOps.merge(spark, dir, Seq((10L, -1L)).toDF("k", "v"), "k")
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(failed).exists(_.contains("non-append commit")),
      s"expected the non-append guard, got: ${failed.getMessage}")

    // ignoreChanges: the rewritten file's rows re-emit (Delta's
    // documented semantics — downstream dedups by key)
    val got = drain(dir, ckpt, ignoreChanges = true)
    assert(got.contains((10L, -1L)), "the updated row must re-emit")
    assert(got.nonEmpty && got.map(_._1).distinct.size == got.size)
    // exactly the one rewritten file's rows, not the whole table
    assert(got.size < 200, "only the rewritten file re-emits")
    assert(got.filter(_._1 != 10L).forall { case (k, v) => v == k * 3 },
      "co-located survivors re-emit with their original values")
  }

  test("streaming schema matches batch; filters apply on the stream output") {
    // NOTE: Spark's V2 filter/column pushdown rules rewrite BATCH
    // DataSourceV2Relation only — micro-batch scans read full files
    // and filter above the scan (same as Delta's source); the batch
    // path keeps the pushdown (DocStoreSpec). This pins correctness
    // of the streamed rows under a post-scan filter.
    val dir = tmp("gds_stream_flt")
    val ckpt = tmp("gds_stream_flt_ckpt")
    spark.range(4096).select(col("id").as("k"), (col("id") % 7).as("v"))
      .coalesce(1).sortWithinPartitions("k")
      .write.format("docstore").mode("overwrite").save(dir)
    val rows = ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.format("docstore").load(dir)
      .filter(col("k") >= 4000L)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        rows.synchronized {
          rows ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = rows.synchronized(rows.toSeq)
    assert(got.size === 96 && got.map(_._1).min === 4000L)
    assert(got.forall { case (k, v) => v == k % 7 })
  }
}
