package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Bucketed co-located join (builder contract: "Co-locate joins via
  * bucketing or pre-partitioning"): writing both join sides bucketed +
  * sorted on the join key lets Spark execute a large-large sort-merge
  * join with NO exchange on either side — at 100 TB this converts the
  * two biggest shuffles of a fact-fact join into local reads. This spec
  * proves the plan shape: same join unbucketed shuffles both sides;
  * bucketed shuffles neither.
  */
class BucketingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // AdaptiveSparkPlan.toString prints the final plan followed by the
  // initial plan — count exchanges in the final section only
  private def exchanges(plan: String): Int =
    "Exchange hashpartitioning".r
      .findAllIn(plan.split("== Initial Plan ==").head).size

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, TestSpark.sf)
        .write.mode("overwrite").bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_bkt")
      Tables.lineitem(spark, TestSpark.sf)
        .write.mode("overwrite").bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_bkt")

      val bucketed = spark.table("orders_bkt")
        .join(spark.table("lineitem_bkt"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      bucketed.collect()
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString

      val unbucketed = Tables.orders(spark, TestSpark.sf)
        .join(Tables.lineitem(spark, TestSpark.sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val unbucketedPlan = unbucketed.queryExecution.executedPlan.toString

      // unbucketed: both join inputs shuffle on the key (+ agg exchange)
      assert(exchanges(unbucketedPlan) >= 3, unbucketedPlan.take(2000))
      // bucketed: the join reads co-located buckets — only the final
      // aggregation exchanges
      assert(exchanges(bucketedPlan) === 1, bucketedPlan.take(2000))
      assert(bucketedPlan.contains("SortMergeJoin"), bucketedPlan.take(2000))

      // and, of course, identical results
      assert(bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
        unbucketed.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }

  test("q_join_bucketed: declared query joins with zero shuffle exchanges") {
    val df = SparkEntry.queries("q_join_bucketed")(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // merge hint + bucket-aligned sorted scans: the only hash exchange
    // is the final per-priority aggregation; the join sides read local
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(exchanges(plan) === 1, plan.take(2000))
  }
}
