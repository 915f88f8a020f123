package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_pca_topk (SURVEY.md §2.25): orthogonal iteration must deliver
  * what deflation-free power iteration cannot — several components
  * that are (a) mutually orthogonal, (b) eigenvalue-ordered, and
  * (c) consistent with the single-direction q_pca_power on the
  * shared component 0.
  */
class PcaTopkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val topk = queries.Inventory.queries("q_pca_topk")(spark, TestSpark.sf)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  private lazy val comps: Map[Long, Array[Double]] = topk.groupBy(_._1)
    .map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3) }

  test("pairwise orthogonality of the extracted components") {
    val ks = comps.keys.toSeq.sorted
    for (a <- ks; b <- ks if a < b) {
      val dot = comps(a).zip(comps(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) <= 1e-5, s"components ($a, $b) dot $dot not orthogonal")
    }
  }

  test("components are unit-norm") {
    comps.foreach { case (c, v) =>
      val n2 = v.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) <= 1e-5, s"component $c norm² $n2")
    }
  }

  test("eigenvalue estimates are strictly ordered (top component first)") {
    val eig = topk.groupBy(_._1).map { case (c, rows) => c -> rows.head._4 }
    val ks = eig.keys.toSeq.sorted
    ks.sliding(2).foreach { case Seq(a, b) =>
      assert(eig(a) > eig(b),
        s"eigenvalue ordering violated: λ$a=${eig(a)} <= λ$b=${eig(b)}")
    }
    assert(eig(ks.head) > 0.0)
  }

  test("component 0 equals q_pca_power exactly (loading and eigenvalue)") {
    val power = queries.Inventory.queries("q_pca_power")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val c0 = topk.filter(_._1 == 0L).sortBy(_._2)
    assert(c0.map(t => (t._2, t._3, t._4)).toSeq === power.toSeq)
  }
}
