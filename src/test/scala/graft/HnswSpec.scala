package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}
import graft.queries.AnnQueries

/** Graph-ANN (q_ann_hnsw) invariants: the randomized HNSW insertion
  * order is replaced by a deterministic build, and THESE are the tests
  * that earn that claim — the edge set must be a pure function of the
  * data (invariant under input partitioning), the search cost must be
  * beam-bounded, and the measured recall must justify the index's
  * place in the family (it exists because it beats the IVF arm).
  */
class HnswSpec extends AnyFunSuite {

  private def corpus = spark.read.parquet(s"$sf/embeddings.parquet")
    .filter(col("vec_id") >= 5)
    .select(col("vec_id"), col("embedding"), col("label"))

  test("graph build is deterministic across input partitionings") {
    val base = AnnQueries.hnswEdges(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val repart = AnnQueries.hnswEdges(corpus.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base == repart)
    assert(base.nonEmpty)
  }

  test("search cost is beam-bounded: n_visited <= seeds + rounds*beam*maxdeg") {
    val edges = AnnQueries.hnswEdges(corpus)
    val maxDeg = edges.groupBy("src").count().agg(max("count")).head().getLong(0)
    val bound = AnnQueries.HnswSeeds * (1 + maxDeg) +
      AnnQueries.HnswRounds.toLong * AnnQueries.HnswBeam * (1 + maxDeg)
    val rows = SparkEntry.queries("q_ann_hnsw")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= bound, s"probe ${r.getLong(0)} visited ${r.getLong(1)} > $bound")
    }
  }

  test("graph arm beats the IVF arm's mean recall@10 on the same exact truth") {
    def meanRecall(key: String, colName: String) = {
      val rows = SparkEntry.queries(key)(spark, sf)
        .select(colName).collect().map(_.getDouble(0))
      rows.sum / rows.length
    }
    val hnsw = meanRecall("q_ann_hnsw", "recall_at_10")
    val ivf = meanRecall("q_ann_recall", "recall_at_10")
    assert(hnsw >= ivf, s"hnsw $hnsw < ivf $ivf")
    // the index earns its place: strong absolute recall at this scale
    assert(hnsw >= 0.7, s"hnsw mean recall $hnsw below floor")
  }
}
