package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Filtered-ANN invariants (q_ann_filtered): the pre-filter/post-filter
  * recall trade must hold structurally — a post-filter survivor is a
  * matching cluster candidate whose filtered rank is bounded by its
  * unfiltered rank, so post ⊆ pre per probe.
  */
class FilteredAnnSpec extends AnyFunSuite {

  test("post-filter recall never exceeds pre-filter recall, per probe") {
    val rows = SparkEntry.queries("q_ann_filtered")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pre = r.getAs[Long]("pre_hits")
      val post = r.getAs[Long]("post_hits")
      assert(post <= pre,
        s"probe ${r.get(0)}: post_hits $post > pre_hits $pre")
      assert(pre >= 0 && pre <= 10 && post >= 0 && post <= 10)
    }
  }

  test("recall columns are hits/10 on the 6-grid") {
    val rows = SparkEntry.queries("q_ann_filtered")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("pre_recall") == r.getAs[Long]("pre_hits") / 10.0)
      assert(r.getAs[Double]("post_recall") == r.getAs[Long]("post_hits") / 10.0)
    }
  }
}
