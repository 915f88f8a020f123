package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Partitioning-determinism gate: a declared query's RESULT must not
  * depend on how the data happens to be partitioned — task retries,
  * cluster resizes and AQE re-plans all change partitioning at 100 TB,
  * and any query whose output moved with it would be nondeterministic
  * in production (and silently desync from its oracle, which has no
  * notion of partitions at all).
  *
  * The queries sampled here are the ones whose SHAPES make partitioning
  * visible if the implementation is wrong: bucketed two-pass cumulatives
  * (pack/skyline/auc), the broadcast-offset global sequence (enrich),
  * iterative fixpoints (dedup_cluster), bounded-slice rank self-joins
  * (rank_fusion), per-key sessionization, and salted aggregation.
  * Everything is re-run under a deliberately hostile shuffle-partition
  * count (3) and must collect bit-identically to the local[32]/32 run.
  */
class RepartitionInvarianceSpec extends AnyFunSuite {

  private def collectNow(key: String): Seq[Seq[Any]] =
    SparkEntry.queries(key)(spark, sf).collect().toSeq.map(_.toSeq)

  private val sensitive = Seq(
    "q_pack_sequences", "q_skyline", "q_auc", "q_pr_curve", "q_enrich",
    "q_dedup_cluster", "q_sessionize", "q_rank_fusion", "q_agg_salted",
    // r6o/r6q: decimal-summed ADC distances, bounded-denominator mix
    // weights, shard-partitioned loader order
    "q_ann_pq", "q_mix_temperature", "q_shuffle_shards",
    // r8: driver-paced EM with per-iteration distributed collects,
    // expand-based distinct aggregation, KN term-table joins
    "q_unigram_lm", "q_distinct_n", "q_perplexity_kn",
    // r9: partitioned fact write (file-per-partition layout) + DPP join
    "q_dpp_join",
    // r9h: max-normalized integer fixpoint, window-paired clip join
    "q_hits", "q_bleu",
    // r9i: synchronous argmax rounds (tie order must decide, not
    // partition order), transition-matrix reshard audit
    "q_label_prop", "q_rendezvous",
    // r10: checkpointed peel rounds, hash-argmin walk windows (whose
    // fixed-count pin FOLLOWS the toggled setting), greedy segmentation
    // over bounded vocab collects, all-integer seasonal split
    "q_kcore", "q_random_walk", "q_wordpiece", "q_stl",
    // r10b: pair-keyed DP repartition pin follows the toggled setting
    "q_cer",
    // r10c: CC fixpoint over blocked candidates; k-exploded integer SGD
    "q_entity_resolution", "q_mf_step",
    // r10e: per-user min-plus fold over collected event-time series
    "q_hmm_viterbi")

  for (key <- sensitive)
    test(s"$key: result invariant under shuffle-partition count") {
      val conf = spark.conf
      val orig = conf.get("spark.sql.shuffle.partitions")
      val base = collectNow(key)
      try {
        conf.set("spark.sql.shuffle.partitions", "3")
        // drop plan-matched cached stages from the baseline run so the
        // toggled run actually re-executes persisted subtrees
        spark.sharedState.cacheManager.clearCache()
        assert(collectNow(key) == base,
          s"$key changed under 3 shuffle partitions")
      } finally conf.set("spark.sql.shuffle.partitions", orig)
    }
}
