package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data layout is a first-class scale lever: the same parquet rows,
  * range-clustered on the filter key, let min/max statistics skip whole
  * row groups at the scan — the difference between reading 1/N of
  * 100 TB and reading all of it. This pins that a selective range
  * predicate on a sorted layout emits far fewer scan rows than the
  * identical query on a shuffled layout.
  */
class LayoutPruningSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  test("range-clustered parquet skips row groups a shuffled layout must read") {
    val base = Files.createTempDirectory("graft_layout").toString
    val data = spark.range(0, 200000)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))

    // shuffled layout: every file spans the full key range
    data.orderBy(hash(col("k"))).repartition(8)
      .write.mode("overwrite").parquet(s"$base/shuffled")
    // clustered layout: repartitionByRange + sortWithinPartitions —
    // each file owns a disjoint key range, so its min/max stats bite
    data.repartitionByRange(8, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$base/clustered")

    def q(dir: String) = spark.read.parquet(dir)
      .filter(col("k") >= 100000 && col("k") < 101000)

    // same answer either way…
    assert(q(s"$base/shuffled").count() == 1000)
    assert(q(s"$base/clustered").count() == 1000)

    // …but the clustered scan reads a fraction of the rows: the pushed
    // range predicate skips every row group whose [min,max] misses it
    val shuffledRows = scanOutputRows(q(s"$base/shuffled"))
    val clusteredRows = scanOutputRows(q(s"$base/clustered"))
    assert(shuffledRows >= 150000L,
      s"shuffled layout should read ~everything, read $shuffledRows")
    assert(clusteredRows <= shuffledRows / 4,
      s"clustered layout should skip most row groups: $clusteredRows vs $shuffledRows")
  }
}
