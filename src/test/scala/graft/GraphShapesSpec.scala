package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraphQueries

/** Pins PageRank's size-conditional rank-join strategy (VERDICT r6 #1):
  * below the node ceiling the per-iteration rank join must be a forced
  * broadcast; above it (forced here via the conf ceiling = 0 and auto-
  * broadcast disabled so the planner cannot sneak a broadcast back in)
  * the loop must run shuffle-joins only — and the two regimes must be
  * bit-identical, because the arithmetic is exact BIGINT either way.
  */
class GraphShapesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Collects the hash-join kinds of the OUTER (iteration) plan only:
    * descends through AQE wrappers but NOT into cached relations, so
    * the edge-build joins frozen inside InMemoryRelation (which are
    * legitimately broadcast at any scale) don't contaminate the
    * rank-join assertion.
    */
  private def joinKinds(p: SparkPlan): Seq[String] = {
    val self = p match {
      case _: BroadcastHashJoinExec => Seq("broadcast")
      case _: SortMergeJoinExec     => Seq("sortmerge")
      case _: ShuffledHashJoinExec  => Seq("shuffledhash")
      case _                        => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other                    => other.children
    }
    self ++ kids.flatMap(joinKinds)
  }

  test("q_pagerank small-graph regime broadcasts the rank table") {
    TestSpark.withConf(
      GraphQueries.BroadcastMaxNodesConf -> Long.MaxValue.toString) {
      val b = GraphQueries.buildPagerank(spark, sf)
      assert(b.broadcastRegime)
      val kinds = joinKinds(b.ranks.queryExecution.executedPlan)
      // one forced BroadcastHashJoin per iteration (the broadcast(n)
      // scalar crossJoins are nested-loop and don't count here)
      assert(kinds.count(_ == "broadcast") >= 3, kinds.toString)
      b.persistedEdges.unpersist()
    }
  }

  test("q_pagerank large-graph regime is co-partitioned, no broadcast") {
    TestSpark.withConf(
      GraphQueries.BroadcastMaxNodesConf -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val b = GraphQueries.buildPagerank(spark, sf)
      assert(!b.broadcastRegime)
      val kinds = joinKinds(b.ranks.queryExecution.executedPlan)
      assert(!kinds.contains("broadcast"), kinds.toString)
      assert(kinds.count(k => k == "sortmerge" || k == "shuffledhash") >= 3,
        kinds.toString)
      b.persistedEdges.unpersist()
    }
  }

  test("q_pagerank regimes are bit-identical") {
    val small = TestSpark.withConfValue(
      Seq(GraphQueries.BroadcastMaxNodesConf -> Long.MaxValue.toString)) {
      val b = GraphQueries.buildPagerank(spark, sf)
      val rows = b.ranks.orderBy("id").collect().toSeq
      b.persistedEdges.unpersist()
      rows
    }
    val large = TestSpark.withConfValue(
      Seq(GraphQueries.BroadcastMaxNodesConf -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      val b = GraphQueries.buildPagerank(spark, sf)
      val rows = b.ranks.orderBy("id").collect().toSeq
      b.persistedEdges.unpersist()
      rows
    }
    assert(small.nonEmpty)
    assert(small == large)
  }
}
