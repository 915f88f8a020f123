package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates for ops/ConnectedComponents: the long-chain fixture a plain
  * O(diameter) min-label loop cannot pass inside the round cap, the
  * log-bound on rounds that makes deep graphs tractable at scale, and
  * the checkpointed-lineage path.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def nodesDf(ids: Seq[Long]) = ids.toDF("node")
  private def edgesDf(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("ea", "eb")

  test("120-node path graph: one component, component-min labels, O(log d) rounds") {
    val n = 120L
    val (labels, rounds) = graft.ops.ConnectedComponents.run(
      nodesDf(0L until n),
      edgesDf((0L until n - 1).map(i => (i, i + 1))))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.values.forall(_ == 0L), "every node must carry the component min")
    // pointer doubling: reach roughly doubles per round, so a
    // 119-hop chain needs ~log2(119)+slack rounds, not 119
    assert(rounds <= 15, s"expected O(log diameter) convergence, took $rounds rounds")
  }

  test("two components plus an isolated node keep distinct min labels") {
    val (labels, _) = graft.ops.ConnectedComponents.run(
      nodesDf(Seq(1L, 2L, 3L, 10L, 11L, 99L)),
      edgesDf(Seq((2L, 3L), (1L, 2L), (10L, 11L))))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("frequent checkpoints (every 2 rounds) do not change the fixpoint") {
    val n = 60L
    val (labels, rounds) = graft.ops.ConnectedComponents.run(
      nodesDf(0L until n),
      edgesDf((0L until n - 1).map(i => (i, i + 1))),
      checkpointEvery = 2)
    assert(rounds >= 4, "fixture too shallow to exercise a checkpoint")
    assert(labels.collect().forall(_.getLong(1) == 0L))
  }
}
