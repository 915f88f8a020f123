package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.VectorFunctions._
import graft.util.Det

/** Native vector expressions must be bit-identical to the interpreted
  * HOF folds they replace (Det.*Hof) — the HOF forms are the proven
  * DuckDB-oracle twins, so equality transfers oracle parity.
  * Exercised over the real embeddings table (float arrays) and a
  * double-array variant, covering both element-type widenings.
  */
class VectorExprsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def vecs = Tables.embeddings(spark, TestSpark.sf)
    .select(col("vec_id"), col("embedding").as("a"),
      expr("reverse(embedding)").as("b"))

  test("dot / l2sq / norm2: native == HOF on float arrays") {
    val diff = vecs.select(
      (Det.dot("a", "b") - Det.dotHof("a", "b")).as("d1"),
      (Det.l2sq("a", "b") - Det.l2sqHof("a", "b")).as("d2"),
      (Det.norm2("a") - Det.norm2Hof("a")).as("d3"))
      .agg(sum(abs(col("d1"))), sum(abs(col("d2"))), sum(abs(col("d3"))))
      .collect().head
    assert(diff.getDouble(0) == 0.0 && diff.getDouble(1) == 0.0 &&
      diff.getDouble(2) == 0.0)
  }

  test("dot / l2sq: native == HOF on double arrays") {
    val d = vecs.select(
      expr("transform(a, x -> CAST(x AS DOUBLE))").as("a"),
      expr("transform(b, x -> CAST(x AS DOUBLE))").as("b"))
    val diff = d.select(
      (Det.dot("a", "b") - Det.dotHof("a", "b")).as("d1"),
      (Det.l2sq("a", "b") - Det.l2sqHof("a", "b")).as("d2"))
      .agg(sum(abs(col("d1"))), sum(abs(col("d2")))).collect().head
    assert(diff.getDouble(0) == 0.0 && diff.getDouble(1) == 0.0)
  }

  test("sortedIntersectCount == size(array_intersect) on sorted arrays") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(2L, 4L, 6L), Seq(2L, 4L, 6L))
    ).toDF("a", "b")
    val rows = df.select(
      sortedIntersectCount(col("a"), col("b")).as("native"),
      expr("CAST(size(array_intersect(a, b)) AS BIGINT)").as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("hyperplaneLshKeys == HOF formula (groups=4, bits=8, stride=64)") {
    val d = vecs.limit(50)
      .select(expr("transform(a, x -> CAST(x AS DOUBLE))").as("e"))
    val hof = "transform(sequence(0, 3), g -> g * 256 + aggregate(" +
      "transform(sequence(0, 7), p -> CASE WHEN aggregate(" +
      "transform(e, (x, i) -> x * (((((g * 8 + p) * 64 + i) * 2654435761) % 97) - 48)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0 THEN 1 ELSE 0 END), " +
      "0, (a, b) -> a * 2 + b))"
    val rows = d.select(
      hyperplaneLshKeys(col("e"), 4, 8, 64).as("native"),
      expr(hof).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Int](1).map(_.toLong))
    }
  }
}
