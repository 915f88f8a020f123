package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The other half of the builder contract's "salting or AQE for skew"
  * clause (salting: ops/Skew + q_agg_salted). This proves the AQE path:
  * a shuffled join whose build of one partition is far larger than the
  * rest must be re-planned at runtime by
  * `spark.sql.adaptive.skewJoin` into multiple splits of the hot
  * partition — `SortMergeJoin(skew=true)` in the final adaptive plan —
  * instead of one straggler task processing the hot key alone.
  */
class SkewJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed join partition (SortMergeJoin(skew=true))") {
    TestSpark.withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // shrink the skew thresholds so a test-sized hot key qualifies:
      // a partition is "skewed" when > factor × median AND > threshold
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {

      // left: 50k rows, 90% on one hot key, with padding so the hot
      // partition's bytes dwarf the median
      val pad = "x" * 64
      val left = spark.range(0, 50000)
        .select(when(col("id") < 45000, 0L).otherwise(col("id") % 16).as("k"),
          concat(lit(pad), col("id").cast("string")).as("payload"))
      val right = spark.range(0, 16).select(col("id").as("k"),
        concat(lit("dim_"), col("id").cast("string")).as("name"))
      val joined = left.join(right, "k")

      // execute THIS DataFrame (count() would plan a pruned twin and
      // leave joined's own adaptive plan unexecuted/unfinalized)
      assert(joined.collect().length == 50000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        "AQE did not mark the hot partition as skewed:\n" + finalPlan.take(4000))
    }
  }
}
