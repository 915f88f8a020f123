package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Incremental-index-maintenance gate (q_ann_ivf_refresh): merging the
  * persisted base partials with the new-batch delta must reproduce the
  * full rebuild EXACTLY — decimal partial sums are associative, so the
  * refreshed-centroid probe is row-identical to q_ann_ivf.
  */
class IvfRefreshSpec extends AnyFunSuite {

  private def canon(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("refreshed-index probe matches the full-rebuild IVF twin row-for-row") {
    val refreshed = SparkEntry.queries("q_ann_ivf_refresh")(spark, sf).collect()
    val rebuild = SparkEntry.queries("q_ann_ivf")(spark, sf).collect()
    assert(refreshed.nonEmpty)
    assert(canon(refreshed) == canon(rebuild))
  }

  test("the persisted partial table exists and is labels-by-dims-sized") {
    SparkEntry.queries("q_ann_ivf_refresh")(spark, sf).collect()
    val sfTag = new java.io.File(sf).getName.replace('.', '_')
    val idxPath =
      s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_ivf_partials_$sfTag"
    val partials = spark.read.parquet(idxPath)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val nLabels = e.select("label").distinct().count()
    val dims = e.selectExpr("size(embedding) AS d").limit(1).collect()(0).getInt(0)
    // one row per (label, dim) — index size independent of corpus rows
    assert(partials.count() == nLabels * dims)
  }
}
