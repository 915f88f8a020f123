package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvSketch

/** KMV distinct-sketch aggregator invariants (q_distinct_n_sketch):
  * the buffer is the k smallest DISTINCT values in ascending order,
  * duplicates are dropped on insert, and merge is associative and
  * order-independent — the properties that make partial aggregation
  * legal.
  */
class KmvSketchSpec extends AnyFunSuite {
  private def brute(k: Int, xs: Seq[Long]): Vector[Long] =
    xs.distinct.sorted.take(k).toVector

  test("reduce: sorted, deduplicated, bounded at k") {
    val agg = new KmvSketch(4)
    val xs = Seq[Long](9, 3, 7, 3, 1, 9, 5, 2, 8, 1)
    val buf = xs.foldLeft(agg.zero)(agg.reduce)
    assert(buf == brute(4, xs))
    assert(buf == Vector(1L, 2L, 3L, 5L))
  }

  test("values above the kth min are rejected without growing the buffer") {
    val agg = new KmvSketch(3)
    val full = Seq[Long](1, 2, 3).foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(full, 10L) == full)
    assert(agg.reduce(full, 2L) == full) // duplicate of a kept value
    assert(agg.reduce(full, 0L) == Vector(0L, 1L, 2L)) // evicts the 3
  }

  test("merge equals single-pass reduce for any split (associativity)") {
    val agg = new KmvSketch(5)
    val rnd = new scala.util.Random(7)
    val xs = Vector.fill(200)(rnd.nextLong(50L)) // dense: many duplicates
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    assert(whole == brute(5, xs))
    for (cut <- Seq(0, 1, 37, 100, 199, 200)) {
      val (a, b) = xs.splitAt(cut)
      val m = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(m == whole, s"split at $cut diverged")
    }
    // order independence: shuffled stream, same sketch
    assert(rnd.shuffle(xs).foldLeft(agg.zero)(agg.reduce) == whole)
  }

  test("under-full sketch IS the distinct set (exact fallback premise)") {
    val agg = new KmvSketch(128)
    val xs = Seq[Long](42, 7, 42, 99, 7)
    assert(xs.foldLeft(agg.zero)(agg.reduce) == Vector(7L, 42L, 99L))
  }
}
