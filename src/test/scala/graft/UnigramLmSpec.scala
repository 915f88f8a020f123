package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorpusQueries

/** Unigram-LM tokenizer training (q_unigram_lm) invariants. */
class UnigramLmSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val trained = CorpusQueries.trainUnigram(spark, sf)
  private lazy val rows = trained._1
  private lazy val nlls = trained._2

  test("hard-EM Viterbi NLL is non-increasing (small-tolerance)") {
    assert(nlls.length == 3)
    // With add-one smoothing and 1e-6-grid cost rounding, strict
    // monotonicity is not theoretically guaranteed — allow 0.1%
    // per-step slack (grid units) so the gate pins the EM trend, not
    // a fixture accident.
    assert(nlls.sliding(2).forall { case Seq(a, b) => b <= a + a / 1000 },
      s"NLL not (approximately) monotone: ${nlls.mkString(",")}")
  }

  test("add-one smoothing keeps every piece alive; counts are positive") {
    assert(rows.nonEmpty && rows.forall(_._2 >= 1L))
  }

  test("single-char fallback covers the corpus alphabet") {
    val pieces = rows.map(_._1).toSet
    val chars = graft.core.Tables.documents(spark, sf)
      .select(explode(expr(
        "transform(sequence(1, length(lower(text))), i -> substring(lower(text), i, 1))")).as("ch"))
      .filter(col("ch").rlike("[a-z]"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(chars.subsetOf(pieces),
      s"alphabet not covered: ${(chars -- pieces).mkString(",")}")
  }

  test("every multi-char piece is a substring of some corpus word") {
    val words = graft.core.Tables.documents(spark, sf)
      .select(explode(expr(
        "regexp_extract_all(lower(text), '([a-z]+)', 1)")).as("w"))
      .distinct().collect().map(_.getString(0))
    val multi = rows.map(_._1).filter(_.length >= 2)
    assert(multi.forall(p => words.exists(_.contains(p))))
  }

  test("apply: every emitted token is a trained vocabulary piece") {
    val pieces = rows.map(_._1).toSet
    val tokens = SparkEntry.queries("q_unigram_apply")(spark, sf).collect()
    assert(tokens.length == 30)
    assert(tokens.forall(r => pieces.contains(r.getString(0))))
    assert(tokens.forall(r => r.getLong(1) == r.getString(0).length.toLong))
  }

  test("declared query: top-30, scalar columns, probabilities sum <= 1") {
    val out = SparkEntry.queries("q_unigram_lm")(spark, sf).collect()
    assert(out.length == 30)
    val pSum = out.map(_.getDouble(2)).sum
    assert(pSum > 0.0 && pSum <= 1.0 + 1e-9)
    // ranked by count desc, piece asc
    val ns = out.map(_.getLong(1))
    assert(ns.sliding(2).forall { case Array(a, b) => b <= a })
  }
}
