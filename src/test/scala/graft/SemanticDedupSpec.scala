package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.DedupQueries

/** Pins q_dedup_semantic's structural claims (VERDICT r6 #2): the pair
  * generator can never emit a cross-cluster pair, and the cluster stage
  * keeps candidate generation sub-quadratic.
  */
class SemanticDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("semantic dedup never generates a cross-cluster pair") {
    val av = DedupQueries.semanticAssigned(spark, sf).persist()
    // independent assignment pass for both pair endpoints: a pair is
    // valid only if both sides re-resolve to the pair's cluster id
    val truth = av.select(col("vec_id"), col("cid").as("true_cid"))
    val pairs = DedupQueries.semanticPairs(av)
      .select(col("keep_cand"), col("vec_id"), col("cid"))
    val crossCluster = pairs
      .join(truth.withColumnRenamed("vec_id", "keep_cand"), "keep_cand")
      .withColumnRenamed("true_cid", "cid_a")
      .join(truth, "vec_id")
      .filter(col("cid_a") =!= col("cid") || col("true_cid") =!= col("cid"))
    assert(crossCluster.count() == 0)
    av.unpersist()
  }

  test("cluster stage keeps candidate pairs sub-quadratic") {
    val av = DedupQueries.semanticAssigned(spark, sf).persist()
    val n = av.count()
    val nPairs = DedupQueries.semanticPairs(av).count()
    // 32 roughly balanced clusters ⇒ ~n²/64 pairs; allow 4× imbalance
    // headroom but require well under the all-pairs n(n−1)/2
    assert(nPairs < n * (n - 1) / 2 / 4,
      s"pairs=$nPairs vs all-pairs=${n * (n - 1) / 2}")
    av.unpersist()
  }

  test("every planted twin caught in-cluster is keep-min-id dropped") {
    val av = DedupQueries.semanticAssigned(spark, sf).persist()
    // twins co-clustered with their original must appear as dropped
    // rows whose keeper is the original (min earlier near-dup)
    val coClustered = av.filter(col("vec_id") < 100000L)
      .select(col("vec_id"), col("cid"))
      .join(av.filter(col("vec_id") >= 100000L)
        .select((col("vec_id") - 100000L).as("vec_id"), col("cid")),
        Seq("vec_id", "cid"))
    val nCo = coClustered.count()
    assert(nCo > 0)
    val dropped = SparkEntry.queries("q_dedup_semantic")(spark, sf)
    val twinRows = dropped.filter(col("vec_id") >= 100000L &&
      col("keeper_id") === col("vec_id") - 100000L)
    assert(twinRows.count() == nCo,
      s"co-clustered twins=$nCo, keep-min-id twin drops=${twinRows.count()}")
    av.unpersist()
  }
}
