package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Incremental HNSW gates (VERDICT r12 #9): the greedy re-link insert
  * must (a) leave the base graph untouched — every new edge has a
  * delta endpoint, (b) make every delta node reachable with the
  * bounded degree the insert contract promises, and (c) preserve
  * search quality — mean recall@10 within ε of the full rebuild
  * (graph refreshes are not row-identical to rebuilds, unlike IVF's
  * associative partials; recall parity IS the contract).
  */
class HnswDeltaSpec extends AnyFunSuite {

  import graft.queries.AnnQueries.{hnswEdges, hnswLinkEdges, HnswM}

  private val e = graft.core.Tables.embeddings(spark, sf)
  private val corpus = e.filter(col("vec_id") >= 5)
    .select(col("vec_id"), col("embedding"), col("label"))
  private val isDelta = col("vec_id") >= 100 && col("vec_id") % 11 === 0
  private lazy val base = corpus.filter(!isDelta)
  private lazy val delta = corpus.filter(isDelta)
  private lazy val deltaIds =
    delta.select("vec_id").collect().map(_.getLong(0)).toSet
  private lazy val baseEdges = hnswEdges(base).persist()
  private lazy val newEdges =
    hnswLinkEdges(delta, base, baseEdges).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("every inserted edge touches a delta endpoint; base-base pairs are never created") {
    assert(deltaIds.nonEmpty, "fixture has no delta nodes")
    assert(newEdges.nonEmpty)
    newEdges.foreach { case (s0, d0) =>
      assert(deltaIds.contains(s0) || deltaIds.contains(d0),
        s"insert created a base-base edge ($s0, $d0)")
    }
  }

  test("every delta node is linked symmetrically with bounded degree") {
    val out = newEdges.filter(p => deltaIds.contains(p._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val in = newEdges.filter(p => deltaIds.contains(p._2))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    deltaIds.foreach { id =>
      assert(out.contains(id), s"delta node $id got no out-links")
      assert(out(id) == in.getOrElse(id, Set.empty),
        s"delta node $id links are not symmetrized")
      assert(out(id).size <= HnswM, s"delta node $id degree ${out(id).size} > M")
      // links land on BASE nodes (the beam searches the base graph)
      out(id).foreach(n => assert(!deltaIds.contains(n),
        s"delta node $id linked to another delta node $n"))
    }
  }

  test("refreshed-graph recall@10 is within eps of the full rebuild") {
    def meanRecall(key: String): Double = {
      val rows = SparkEntry.queries(key)(spark, sf).collect()
      assert(rows.length == 5)
      rows.map(_.getAs[Double]("recall_at_10")).sum / rows.length
    }
    val rebuild = meanRecall("q_ann_hnsw")
    val refreshed = meanRecall("q_ann_hnsw_delta")
    // ε = one hit out of ten on one of the five probes — the slack a
    // single tie-flip costs; anything larger means the insert path
    // degraded the graph
    assert(math.abs(rebuild - refreshed) <= 0.1 + 1e-9,
      s"recall drifted: rebuild $rebuild vs refreshed $refreshed")
  }
}
