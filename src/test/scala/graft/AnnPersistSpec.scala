package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}
import graft.queries.AnnQueries

/** Persisted-index lifecycle gates (q_ann_persisted): the probe must
  * be a pure consumer of the persisted index — same rows as the
  * intra-query twin, and a probe plan with NO index-build stages.
  */
class AnnPersistSpec extends AnyFunSuite {

  private def canon(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("persisted probe matches the intra-query IVF twin row-for-row") {
    val persisted = SparkEntry.queries("q_ann_persisted")(spark, sf).collect()
    val twin = SparkEntry.queries("q_ann_ivf")(spark, sf).collect()
    assert(persisted.nonEmpty)
    assert(canon(persisted) == canon(twin))
  }

  test("probe plan reads the index file and contains no build stages") {
    // run the builder once so the index file exists
    SparkEntry.queries("q_ann_persisted")(spark, sf).collect()
    val sfTag = new java.io.File(sf).getName.replace('.', '_')
    val idxPath = s"${spark.conf.get("spark.sql.warehouse.dir")}/graft_ivf_cent_$sfTag"
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val probe = AnnQueries.ivfSearch(e, spark.read.parquet(idxPath))
    val plan = probe.queryExecution.executedPlan.toString
    // the index table is scanned...
    assert(plan.contains("graft_ivf_cent_"), "probe plan does not scan the index")
    // ...and no centroid-build stage leaked into the probe: the build
    // is the posexplode + two-level aggregation pipeline (Generate)
    assert(!plan.contains("posexplode"), "probe plan re-runs the index build")
    assert(!plan.contains("Generate"), "probe plan re-runs the index build")
  }
}
