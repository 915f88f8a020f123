package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sequence

/** The scale-safe global sequence (ops/Sequence) against its contract:
  * bit-identical to the single-partition `row_number() OVER (ORDER BY
  * key)` for unique keys of any distribution, empty-safe, collision-
  * proof temp columns, fail-fast on Long-span overflow, and no
  * unpartitioned window in its plan.
  */
class SequenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(keys: Seq[Long]): Unit = {
    val df = keys.toDF("k").repartition(5)
    val got = Sequence.globalSequence(df, "k", "seq")
      .select("k", "seq").as[(Long, Long)].collect().toMap
    val expect = keys.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(got == expect)
  }

  test("matches ORDER BY rank for dense, sparse, negative, and skewed keys") {
    check(0L until 500L)
    check(Seq(7L, 1000000L, -5L, 0L, 999L, -1000000L, 3L))
    // heavily skewed into one bucket: correctness must not depend on balance
    check((0L until 200L) ++ Seq(Long.MaxValue / 4, Long.MaxValue / 4 + 1))
  }

  test("empty input keeps the schema contract (null seq column, no rows)") {
    val out = Sequence.globalSequence(Seq.empty[Long].toDF("k"), "k", "seq")
    assert(out.columns.toSeq == Seq("k", "seq") && out.count() == 0)
  }

  test("temp bucket column cannot collide with input columns") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("k", "__seq_bucket0")
    val out = Sequence.globalSequence(df, "k", "seq")
    assert(out.columns.toSeq == Seq("k", "__seq_bucket0", "seq"))
    assert(out.select("seq").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("span overflow fails fast instead of wrapping into wrong buckets") {
    val df = Seq(Long.MinValue + 1, Long.MaxValue - 1).toDF("k")
    val e = intercept[ArithmeticException] {
      Sequence.globalSequence(df, "k", "seq")
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("plan has no unpartitioned window") {
    val df = (0L until 100L).toDF("k")
    val out = Sequence.globalSequence(df, "k", "seq")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val bad = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, "globalSequence must never plan a single-partition window")
  }
}
