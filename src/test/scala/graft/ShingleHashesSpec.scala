package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.ops.TextAnalysis

/** The native ShingleHashes expression must be bit-identical to the
  * interpreted HOF composition it replaces (graft.ops.TextAnalysis
  * .shinglesSpark) — that HOF form is itself the proven DuckDB-oracle
  * twin, so equality here transfers oracle parity to the fast path.
  */
class ShingleHashesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def hofVsNative(texts: Seq[String], n: Int): Unit = {
    import spark.implicits._
    val df = texts.toDF("text").select(split(col("text"), " ").as("ws"))
    val hof = df.select(expr(TextAnalysis.shinglesSpark(n)).as("sh")).collect()
    val nat = df.select(GraftFunctions.shingleHashes(col("ws"), n).as("sh")).collect()
    assert(hof.map(_.getSeq[Long](0)).toSeq === nat.map(_.getSeq[Long](0)).toSeq)
  }

  test("native == HOF on representative docs (n=3)") {
    hofVsNative(Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",                       // exactly n words -> 1 shingle
      "x y z x y z x y z",           // repeated shingles -> distinct
      "one two three four five six seven eight nine ten"
    ), 3)
  }

  test("native == HOF for n=1 and n=2") {
    val docs = Seq("alpha beta gamma delta", "p q p q p")
    hofVsNative(docs, 1)
    hofVsNative(docs, 2)
  }

  test("fewer than n words yields empty array") {
    import spark.implicits._
    val out = Seq("only two").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(GraftFunctions.shingleHashes(col("ws"), 3).as("sh"))
      .collect()
    assert(out.head.getSeq[Long](0).isEmpty)
  }

  test("SQL registration path: shingle_hashes usable via expr()") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val viaSql = Seq("a b c d").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(expr("shingle_hashes(ws, 3)").as("sh")).collect()
    val viaCol = Seq("a b c d").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(GraftFunctions.shingleHashes(col("ws"), 3).as("sh")).collect()
    assert(viaSql.head.getSeq[Long](0) === viaCol.head.getSeq[Long](0))
  }

  test("result is sorted distinct") {
    import spark.implicits._
    val sh = Seq("m n o m n o m n o p").toDF("text")
      .select(split(col("text"), " ").as("ws"))
      .select(GraftFunctions.shingleHashes(col("ws"), 3).as("sh"))
      .collect().head.getSeq[Long](0)
    assert(sh === sh.distinct.sorted)
  }
}
