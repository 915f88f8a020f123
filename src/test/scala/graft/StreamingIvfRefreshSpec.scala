package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Streaming IVF index maintenance (VERDICT r13 #6): q_ann_ivf_refresh
  * merges a delta batch into the persisted per-(label, dim) decimal
  * partial table in BATCH; this pins the streaming twin — a vector
  * stream drained through foreachBatch, each micro-batch's partials
  * merged into the persisted table exactly the way the batch refresh
  * merges its delta. Decimal addition is associative, so the drained
  * table must equal the full-corpus partials BIT-IDENTICALLY no matter
  * how the stream was chopped into micro-batches — the property that
  * makes the index maintainable from ingestion without ever rescanning
  * the base corpus.
  */
class StreamingIvfRefreshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def partials(df: DataFrame): DataFrame = df
    .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
    .groupBy("label", "pos")
    .agg(sum(col("val").cast("decimal(20,10)")).as("sv"), count(lit(1)).as("n"))

  private def collectPartials(df: DataFrame): Map[(Int, Int), (java.math.BigDecimal, Long)] =
    df.collect().map { r =>
      (r.getInt(0), r.getInt(1)) -> ((r.getDecimal(2), r.getLong(3)))
    }.toMap

  test("stream-drained partial merges == full-corpus partials, bit-identical") {
    implicit val sc = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sivf").toString
    val table = s"$dir/partials"
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding"), col("label"))

    // yesterday's build: base partials persisted (the q_ann_ivf_refresh
    // base split)
    partials(e.filter(col("vec_id") % 7 =!= 0))
      .write.mode("overwrite").parquet(table)

    def mergeBatch(batch: DataFrame, batchId: Long): Unit = {
      val merged = spark.read.parquet(table)
        .unionByName(partials(batch))
        .groupBy("label", "pos")
        .agg(sum(col("sv")).as("sv"), sum(col("n")).as("n"))
      val tmp = s"$dir/tmp_$batchId"
      merged.write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite").parquet(table)
    }

    // the ingestion stream: the delta slice in THREE uneven
    // micro-batches (associativity must make the chopping invisible)
    val delta = e.filter(col("vec_id") % 7 === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val cuts = Seq(delta.take(3), delta.slice(3, 40), delta.drop(40))
    val mem = MemoryStream[(Long, Seq[Float], Int)]
    val q = mem.toDF().toDF("vec_id", "embedding", "label")
      .writeStream.foreachBatch(mergeBatch _)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      cuts.foreach { c => mem.addData(c.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    val got = collectPartials(spark.read.parquet(table))
    val want = collectPartials(partials(e))
    assert(got.keySet === want.keySet)
    got.foreach { case (k, (sv, n)) =>
      val (wsv, wn) = want(k)
      assert(n === wn, s"count mismatch at $k")
      assert(sv.compareTo(wsv) === 0, s"sum mismatch at $k: $sv vs $wsv")
    }
    // and the derived centroids (the probe's input) match exactly too
    def cent(p: DataFrame) = p
      .select(col("label"), col("pos"),
        round(col("sv").cast("double") / col("n"), 6).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cent(spark.read.parquet(table)) === cent(partials(e)))
  }
}
