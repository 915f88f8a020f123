package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adaptive-query-execution toggle gate: AQE rewrites plans at runtime
  * (coalesced partitions, skew-split joins, runtime join-strategy
  * switches) — exactly what a 1000-executor cluster does constantly —
  * so every scale-sensitive declared query must collect bit-identically
  * with AQE on and off. Complements RepartitionInvarianceSpec (which
  * varies the shuffle-partition count): together they pin that no
  * declared result depends on HOW the planner physically splits work.
  */
class AqeInvarianceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def collectNow(key: String): Seq[Seq[Any]] =
    SparkEntry.queries(key)(spark, sf).collect().toSeq.map(_.toSeq)

  // queries whose plans AQE actually rewrites: skew-salted and
  // skew-split joins, iterative label propagation, band joins, the
  // decimal-summed ADC chain, nested semi/anti TPC-H shapes
  private val sensitive = Seq(
    "q_join_salted", "q_contamination", "q_dedup_minhash",
    "q_dedup_cluster", "q_triangles", "q_ann_pq", "q_tpch_q21",
    // r8: EM loop with per-round collects, expand-distinct, KN joins
    "q_unigram_lm", "q_distinct_n", "q_perplexity_kn",
    // r9: DPP re-plans under AQE; partitioned write+prune round trip
    "q_dpp_join", "q_scan_partitioned",
    // r10: shrinking-edge-list peel rounds (AQE re-plans every round),
    // the pinned argmin-walk exchange, bounded-set rank windows
    "q_kcore", "q_random_walk", "q_rank_corr")

  for (key <- sensitive)
    test(s"$key: result invariant under AQE on/off") {
      val conf = spark.conf
      val orig = conf.getOption("spark.sql.adaptive.enabled")
      val base = collectNow(key)
      try {
        conf.set("spark.sql.adaptive.enabled", "false")
        // the CacheManager substitutes plan-matched cached stages from
        // the baseline run — without clearing, persisted subtrees would
        // never actually execute under the toggled setting
        spark.sharedState.cacheManager.clearCache()
        assert(collectNow(key) == base, s"$key changed with AQE disabled")
      } finally orig match {
        case Some(v) => conf.set("spark.sql.adaptive.enabled", v)
        case None => conf.unset("spark.sql.adaptive.enabled")
      }
    }
}
