package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_ann_maxsim (SURVEY.md §2.40): late-interaction semantics pinned
  * on a hand-computed fixture, plus the plan contract — probe tokens
  * broadcast, the corpus side never shuffles before the inner max.
  */
class MaxsimSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("MaxSim equals the hand-computed sum-of-max on a tiny fixture") {
    // q tokens: [1,0], [0,2]; doc A tokens: [1,0], [0,1]; doc B: [3,0], [0,0]
    // score(q,A) = max(1,0) + max(0,2) = 3; score(q,B) = max(3,0)+max(0,0) = 3...
    // make them distinct: doc B tokens [2,0],[1,0]:
    // score(q,B) = max(2,1) + max(0,0) = 2
    import graft.functions.VectorFunctions.vecDot
    val q = Seq((0L, 0, Array(1f, 0f)), (0L, 1, Array(0f, 2f)))
    val docs = Seq(
      (10L, 0, Array(1f, 0f)), (10L, 1, Array(0f, 1f)),
      (11L, 0, Array(2f, 0f)), (11L, 1, Array(1f, 0f)))
    val pt = spark.createDataFrame(q).toDF("probe_id", "ti", "pv")
    val ct = spark.createDataFrame(docs).toDF("cand_id", "tj", "cv")
    val scored = ct.join(broadcast(pt))
      .select(col("probe_id"), col("cand_id"), col("ti"),
        vecDot(col("pv"), col("cv")).as("dot"))
      .groupBy("probe_id", "cand_id", "ti").agg(max("dot").as("b"))
      .groupBy("probe_id", "cand_id").agg(sum("b").as("score"))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(scored === Map(10L -> 3.0, 11L -> 2.0))
  }

  test("q_ann_maxsim plan: probe tokens broadcast; top-3 per probe " +
    "ordered by score then id") {
    val df = graft.queries.Inventory.queries("q_ann_maxsim")(
      spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"probe tokens must broadcast, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus token table must never sort-merge against probes")
    val rows = df.collect()
    assert(rows.length === 15)
    rows.grouped(3).foreach { g =>
      assert(g.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
      assert(g.map(_.getDouble(3)).toSeq.reverse.sorted.reverse ===
        g.map(_.getDouble(3)).toSeq, "scores non-increasing within probe")
    }
  }
}
