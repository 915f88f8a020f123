package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan gates for the physical-layout operators
  * (`q_zorder`, `q_bloom_join`): the properties that make them
  * layout operators — clustering locality and filter soundness —
  * asserted directly, not just hash-compared.
  */
class LayoutShapesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(key: String) = SparkEntry.queries(key)(spark, sf)

  test("q_zorder: buckets conserve rows and cover tight rectangles") {
    val rows = run("q_zorder").collect()
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "row conservation")
    assert(rows.length <= 256, "at most 256 buckets")
    // locality: a Z-order bucket spans ≤ 1/4 of the global range in
    // EACH dimension (top 4 interleaved bits pin 2 high bits per dim);
    // a 1-D sort would leave the second dimension's span at ~100%.
    val priceMin = rows.map(_.getDouble(2)).min
    val priceMax = rows.map(_.getDouble(3)).max
    val custMin = rows.map(_.getLong(4)).min
    val custMax = rows.map(_.getLong(5)).max
    val priceSpan = priceMax - priceMin
    val custSpan = (custMax - custMin).toDouble
    rows.foreach { r =>
      assert(r.getDouble(3) - r.getDouble(2) <= priceSpan / 4 + 1e-9,
        s"price span of bucket ${r.getLong(0)}")
      assert((r.getLong(5) - r.getLong(4)).toDouble <= custSpan / 4 + 1e-9,
        s"cust span of bucket ${r.getLong(0)}")
    }
  }

  test("q_bloom_join: no false negatives, FP accounting consistent") {
    val r = run("q_bloom_join").collect().head
    val (total, bits, passed, truth, fps) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val trueDirect = {
      val c = graft.core.Tables.customer(spark, sf)
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      graft.core.Tables.orders(spark, sf).select("o_custkey").collect()
        .count(row => c.contains(row.getLong(0))).toLong
    }
    assert(truth == trueDirect, "exact match count")
    assert(passed >= truth, "a Bloom filter never drops a true match")
    assert(fps == passed - truth, "FP arithmetic")
    assert(passed <= total && bits <= 4096, "bounds")
  }

  test("q_bloom_join: filter and dim sides broadcast, fact scans once") {
    val plan = run("q_bloom_join").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "broadcast semi joins")
    assert(!plan.contains("SortMergeJoin"),
      "no shuffle join anywhere in a Bloom pre-filter plan")
  }
}
