package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Bench-scale companion to SkewJoinSpec (VERDICT r8 item 5). That spec
  * proves AQE skew-splitting on a synthetic 50k-row frame; this one
  * executes the INVENTORY query `q_join_skew_aqe` — the planted-90%-hot
  * join over the real sf0.1 lineitem (600k rows, the per-round bench
  * input) — and pins that the runtime re-plan actually engages there:
  * the final adaptive plan must carry `skew=true` on the sort-merge
  * join whose hot partition held ~90% of the fact shuffle bytes.
  *
  * Two sandbox artifacts are scaled back to production shape, both
  * documented because each is a real 100 TB lesson:
  *
  *  - **Mapper boundaries.** AQE splits a skewed reduce partition at
  *    MAP-OUTPUT boundaries (PartialReducerPartitionSpec is a
  *    [startMapIndex, endMapIndex) range — ShufflePartitionsUtil
  *    .createSkewPartitionSpecs returns None when one mapper wrote all
  *    the bytes). The driver-generated sf0.1 lineitem.parquet is a
  *    SINGLE ~10 MB row group, so however small
  *    spark.sql.files.maxPartitionBytes is set, one scan task carries
  *    every row and the hot partition is one unsplittable block — a
  *    layout no real deployment has (a 100 TB fact table arrives as
  *    thousands of files/row groups = thousands of mappers). The spec
  *    therefore materializes the IDENTICAL sf0.1 rows as an 8-file
  *    table once and points the unmodified inventory query at it.
  *  - **Thresholds.** A sandbox shuffle partition is MBs where a
  *    production one is hundreds of MBs, so the skew gate scales the
  *    same way a real deployment scales it to executor memory: 4 MB
  *    threshold / 2 MB advisory splits (defaults 256 MB / 64 MB),
  *    factor 2 over the median. The DATA is not shrunk: this is the
  *    bench input at bench scale.
  */
class SkewBenchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("q_join_skew_aqe at sf0.1: AQE splits the hot partition (skew=true)") {
    // sf0.1 content, production layout: 8 parquet files per table
    val sfDir = Files.createTempDirectory("graft_skew_sf").toString
    Seq("lineitem", "nation").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet")
        .repartition(8).write.mode("overwrite").parquet(s"$sfDir/$t.parquet")
    }
    TestSpark.withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2MB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val df = SparkEntry.queries("q_join_skew_aqe")(spark, sfDir)
      // execute THIS DataFrame so ITS adaptive plan is finalized
      // (16 dim rows -> the collected result is tiny)
      val rows = df.collect()
      assert(rows.length == 16, s"expected 16 dim groups, got ${rows.length}")
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not split the planted hot partition at sf0.1:\n" +
          finalPlan.take(4000))
      // and the hot key really carried ~90% of the rows (the premise)
      val nItems = rows.map(r => r.getAs[Long]("n_items"))
      assert(nItems.max.toDouble / nItems.sum > 0.85,
        s"planted skew premise broken: max group ${nItems.max} of ${nItems.sum}")
    }
  }
}
