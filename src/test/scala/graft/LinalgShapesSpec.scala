package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic gate for q_pca_power: the emitted direction must match a
  * plain-Scala power iteration on the same Gram matrix (up to the
  * picount rounding, far below the tolerance), be unit-norm, and
  * carry a positive dominant-eigenvalue estimate consistent with the
  * Rayleigh quotient.
  */
class LinalgShapesSpec extends AnyFunSuite {

  test("q_pca_power equals a dense power iteration") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = vecs.head.length
    val g = Array.ofDim[Double](dims, dims)
    vecs.foreach { v =>
      var i = 0
      while (i < dims) {
        var j = 0
        while (j < dims) { g(i)(j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    var v = Array.fill(dims)(0.125)
    var n = 0.0
    for (_ <- 1 to 3) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => g(i)(j) * v(j)).sum)
      n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / n)
    }
    val rows = SparkEntry.queries("q_pca_power")(spark, sf).collect()
    assert(rows.length == dims)
    val loadings = rows.sortBy(_.getLong(0)).map(_.getDouble(1))
    assert(math.abs(math.sqrt(loadings.map(x => x * x).sum) - 1.0) < 1e-4,
      "unit norm")
    loadings.zip(v).zipWithIndex.foreach { case ((got, want), i) =>
      assert(math.abs(got - want) < 1e-4, s"dim ${i + 1}: $got vs $want")
    }
    val lambda = rows.head.getDouble(2)
    assert(math.abs(lambda - n) < 1e-2, s"eigenvalue $lambda vs $n")
    assert(lambda > 0)
  }
}
