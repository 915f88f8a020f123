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

  // ------------------------------------------------- hierarchical HNSW

  test("layer assignment is a pure function of vec_id: every layer-1 " +
    "edge endpoint is a mod-8 node") {
    val l1 = AnnQueries.hnswNavEdges(
      corpus.filter(col("vec_id") % AnnQueries.HnswL1Mod === 0),
      AnnQueries.HnswNavMUpper)
    val bad = l1.filter(col("src") % AnnQueries.HnswL1Mod =!= 0 ||
      col("dst") % AnnQueries.HnswL1Mod =!= 0).count()
    assert(bad === 0L)
  }

  test("navigable graph build is deterministic across input partitionings " +
    "and degree-bounded") {
    val base = AnnQueries.hnswNavEdges(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val repart = AnnQueries.hnswNavEdges(corpus.repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(base == repart)
    // out-degree ≤ own M links + in-links from others' M choices is
    // not a fixed constant, but each node CHOOSES at most M — verify
    // via the asymmetric half: no src exceeds M chosen + M reverse
    // per potential chooser is unbounded in theory; pin the practical
    // bound that the sym graph stays sparse (≤ 8·M)
    val maxDeg = base.groupBy(_._1).map(_._2.size).max
    assert(maxDeg <= 8 * AnnQueries.HnswNavM,
      s"nav graph degenerated into a hub: max degree $maxDeg")
  }

  test("hierarchy dominates the flat graph: strictly better mean recall " +
    "at strictly fewer total visited (entry scan counted)") {
    val flat = SparkEntry.queries("q_ann_hnsw")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val layered = SparkEntry.queries("q_ann_hnsw_layered")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val (flatVis, flatRec) = (flat.map(_._1).sum, flat.map(_._2).sum)
    val (layVis, layRec) = (layered.map(_._1).sum, layered.map(_._2).sum)
    assert(layRec > flatRec,
      s"layered recall sum $layRec not above flat $flatRec")
    assert(layVis < flatVis,
      s"layered visited sum $layVis not below flat $flatVis")
    // absolute floor: the hierarchy must stay a high-recall index
    assert(layRec / layered.length >= 0.9,
      s"layered mean recall ${layRec / layered.length} below floor")
  }

  test("persisted layered probe matches the intra-query layered twin row-for-row") {
    // build-once/probe-many for the hierarchy: both layer edge tables
    // come back from parquet index files, and the descent over fresh
    // scans must reproduce the in-query build exactly
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val persisted =
      SparkEntry.queries("q_ann_hnsw_layered_persisted")(spark, sf).collect()
    val twin = SparkEntry.queries("q_ann_hnsw_layered")(spark, sf).collect()
    assert(persisted.nonEmpty)
    assert(canon(persisted) == canon(twin))
    // the index files exist as independent artifacts a later session
    // (or another cluster) can probe without rebuilding
    val sfTag = new java.io.File(sf).getName.replace('.', '_')
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    for (p <- Seq(s"$wh/graft_hnswl_l0_$sfTag", s"$wh/graft_hnswl_l1_$sfTag"))
      assert(spark.read.parquet(p).count() > 0, s"missing index table $p")
  }
}
