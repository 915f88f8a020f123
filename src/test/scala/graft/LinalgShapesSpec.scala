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

  test("q_ridge_solve equals a dense normal-equations Cramer solve") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = li.length.toDouble
    def s(f: ((Double, Double, Double)) => Double): Double = li.map(f).sum
    val a11 = n + 10; val a12 = s(_._1); val a13 = s(_._2)
    val a22 = s(t => t._1 * t._1) + 10; val a23 = s(t => t._1 * t._2)
    val a33 = s(t => t._2 * t._2) + 10
    val b1 = s(_._3); val b2 = s(t => t._1 * t._3); val b3 = s(t => t._2 * t._3)
    val det = a11 * (a22 * a33 - a23 * a23) - a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    val w0 = (b1 * (a22 * a33 - a23 * a23) - a12 * (b2 * a33 - a23 * b3) +
      a13 * (b2 * a23 - a22 * b3)) / det
    val w1 = (a11 * (b2 * a33 - a23 * b3) - b1 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * b3 - b2 * a13)) / det
    val w2 = (a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13) +
      b1 * (a12 * a23 - a22 * a13)) / det
    val rmse = math.sqrt(li.map { case (x1, x2, y) =>
      val r = y - (w0 + w1 * x1 + w2 * x2); r * r
    }.sum / n)
    val row = SparkEntry.queries("q_ridge_solve")(spark, sf).collect().head
    assert(row.getLong(0) == li.length.toLong)
    assert(math.abs(row.getDouble(1) - w0) < 1e-6, s"w0 ${row.getDouble(1)} vs $w0")
    assert(math.abs(row.getDouble(2) - w1) < 1e-6, s"w1 ${row.getDouble(2)} vs $w1")
    assert(math.abs(row.getDouble(3) - w2) < 1e-6, s"w2 ${row.getDouble(3)} vs $w2")
    assert(math.abs(row.getDouble(4) - rmse) < 1e-3, s"rmse ${row.getDouble(4)} vs $rmse")
    // the fit must beat the intercept-only baseline (stddev of y)
    val ybar = b1 / n
    val sd = math.sqrt(li.map(t => (t._3 - ybar) * (t._3 - ybar)).sum / n)
    assert(row.getDouble(4) < sd, "ridge fit no better than the mean")
  }
}
