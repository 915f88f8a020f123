package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}
import graft.queries.AnnQueries

/** q_ann_delete (SURVEY.md §2.6): after a tombstone batch, no deleted
  * id may surface from either persisted index — the IVF arm because
  * its candidate scan anti-joins the tombstone table, the graph arm
  * because the survivor join masks deleted nodes before any beam —
  * and recall on the surviving corpus must stay index-grade.
  */
class AnnDeleteSpec extends AnyFunSuite {

  private lazy val parts = AnnQueries.annDeleteParts(spark, sf)
  private lazy val (out, ivfTop10, gTop10, tombs) = parts
  private lazy val tombIds =
    tombs.collect().map(_.getLong(0)).toSet

  test("the tombstone slice is non-trivial and spares probes and hubs") {
    assert(tombIds.nonEmpty)
    assert(tombIds.forall(id => id >= 100 && id % 17 == 0))
  }

  test("zero deleted ids in any IVF top-10") {
    val hits = ivfTop10.collect().map(_.getLong(1))
    assert(hits.nonEmpty)
    assert(!hits.exists(tombIds), s"tombstoned id served by the IVF arm")
  }

  test("zero deleted ids in any graph top-10 (edge table untouched)") {
    val hits = gTop10.collect().map(_.getLong(1))
    assert(hits.nonEmpty)
    assert(!hits.exists(tombIds), s"tombstoned id served by the graph arm")
  }

  test("recall on the surviving corpus does not degrade vs the pre-delete arms") {
    val rows = out.collect()
    assert(rows.length === 5)
    val ivf = rows.map(_.getDouble(2)).sum / rows.length
    val g = rows.map(_.getDouble(4)).sum / rows.length
    // IVF's absolute recall is bounded by the label quantizer (the
    // q_ann_recall readout at this sf); the delete contract is
    // NON-DEGRADATION against that pre-delete baseline
    val ivfBaseRows = SparkEntry.queries("q_ann_recall")(spark, sf)
      .select("recall_at_10").collect().map(_.getDouble(0))
    val ivfBase = ivfBaseRows.sum / ivfBaseRows.length
    assert(ivf >= ivfBase - 0.05,
      s"IVF recall degraded by the delete: $ivf vs pre-delete $ivfBase")
    assert(g >= 0.7,
      s"graph mean recall $g collapsed after delete")
  }
}
