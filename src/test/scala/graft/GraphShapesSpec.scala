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

  test("q_hits equals a plain-Scala replay of the integer fixpoint") {
    val pairs = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), 100000L + r.getLong(1)))
    // round 1 authority = in-degree, rescaled; round 1 hub; round 2 auth
    val a1 = pairs.groupBy(_._2).map { case (s, es) => s -> es.length.toLong }
    val ma1 = a1.values.max
    val a1n = a1.map { case (s, a) => s -> a * 1000000L / ma1 }
    val h1 = pairs.groupBy(_._1)
      .map { case (c, es) => c -> es.map(e => a1n(e._2)).sum }
    val mh1 = h1.values.max
    val h1n = h1.map { case (c, h) => c -> h * 1000000L / mh1 }
    val a2 = pairs.groupBy(_._2)
      .map { case (s, es) => s -> es.map(e => h1n(e._1)).sum }
    val ma2 = a2.values.max
    val a2n = a2.map { case (s, a) => s -> a * 1000000L / ma2 }
    val want = (h1n.map { case (c, v) => (c, "hub", v) } ++
      a2n.map { case (s, v) => (s, "auth", v) }).toSet
    val got = SparkEntry.queries("q_hits")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    // max-normalization: each role's top score is exactly 1e6
    assert(got.filter(_._2 == "hub").map(_._3).max == 1000000L)
    assert(got.filter(_._2 == "auth").map(_._3).max == 1000000L)
  }

  test("q_label_prop equals a plain-Scala replay of two synchronous rounds") {
    val pairs = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey")
      .join(graft.core.Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_suppkey"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), 100000L + r.getLong(1)))
    val und = (pairs ++ pairs.map(p => (p._2, p._1))).distinct
    val nbrs = und.groupBy(_._2).map { case (v, es) => v -> es.map(_._1) }
    def step(lbl: Map[Long, Long]): Map[Long, Long] = nbrs.map {
      case (v, ns) =>
        val counts = ns.map(lbl).groupBy(identity)
          .map { case (l, o) => l -> o.size }
        // (count desc, label asc) tie-break — the declared total order
        v -> counts.toSeq.map { case (l, n) => (-n, l) }.min._2
    }
    val l0 = nbrs.keys.map(v => v -> v).toMap
    val l2 = step(step(l0))
    val want = l2.groupBy(_._2).map { case (c, ms) =>
      c -> (ms.size.toLong, ms.keys.min, ms.keys.max)
    }
    val got = SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
    // the label partition covers every node exactly once
    assert(got.values.map(_._1).sum == nbrs.size.toLong)
  }

  test("q_kcore equals a plain-Scala peel-to-fixpoint replay (data-derived rounds)") {
    // rebuild the co-purchase graph driver-side at sf0.001
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = op.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val deg0 = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val n = deg0.size
    val k = deg0.values.toSeq.sorted.apply(((n + 19) / 20) - 1)
    var surv = deg0.keySet
    var cur = edges
    var peelRound = Map.empty[Long, Long]
    var round = 0L
    var done = false
    while (!done) {
      round += 1
      val deg = cur.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
      val peel = surv.filter(v => deg.getOrElse(v, 0L) < k)
      if (peel.isEmpty) done = true
      else {
        peelRound ++= peel.map(_ -> round)
        surv = surv -- peel
        cur = cur.filter { case (a, b) => !peel(a) && !peel(b) }
      }
    }
    // the data-derived convergence count at sf0.001 — a regression in
    // the threshold or the peel logic moves this
    assert(round - 1 == 3L, s"expected 3 peel rounds, got ${round - 1}")
    assert(surv.nonEmpty, "p5 core must be non-empty")
    val coreDeg = cur.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    val got = SparkEntry.queries("q_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.size == n)
    got.foreach { case (id, (pr, d0, cd, kk)) =>
      assert(kk == k)
      assert(d0 == deg0(id))
      assert(pr == peelRound.getOrElse(id, 0L), s"node $id round")
      assert(cd == (if (pr == 0L) coreDeg.getOrElse(id, 0L) else 0L), s"node $id coredeg")
    }
  }
}
