package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_bpe_train is the ITERATIVE loop, not ten independent first steps:
  * later merges must be able to consume symbols produced by earlier
  * merges, which a single q_bpe_pairs-style counting pass cannot do.
  */
class BpeTrainSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bpe training composes: some merge operand is itself a merged symbol") {
    val rows = SparkEntry.queries("q_bpe_train")(spark, sf)
      .orderBy("step").collect()
    assert(rows.length == 10)
    assert(rows.zipWithIndex.forall { case (r, i) => r.getLong(0) == i + 1 })
    assert(rows.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
    // new pairs created by a merge occur at most as often as that merge
    val ns = rows.map(_.getLong(4))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y }, ns.toSeq)
    // the compositional signature: a multi-char operand can only come
    // from an earlier step's merged symbol
    assert(rows.exists(r =>
      r.getString(1).length >= 2 || r.getString(2).length >= 2))
  }

  test("bpe apply encodes with exactly the trained merge alphabet") {
    val merges = SparkEntry.queries("q_bpe_train")(spark, sf)
      .select("merged").collect().map(_.getString(0)).toSet
    val toks = SparkEntry.queries("q_bpe_apply")(spark, sf).collect()
    assert(toks.length == 30)
    toks.foreach { r =>
      val (t, len, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(len == t.length && n > 0)
      // every multi-char token must be a trained merged symbol: the
      // greedy fold can only ever glue what some training step glued
      assert(t.length == 1 || merges.contains(t), s"untrained token $t")
    }
  }
}
