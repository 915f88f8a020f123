package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list, BSP-style.
  *
  * Min-label propagation with pointer doubling: each round every node
  * takes the minimum of (its label, its neighbors' labels), then
  * shortcuts through the label indirection (label(v) ← label(label(v))).
  * The neighbor step alone needs O(diameter) rounds; the doubling step
  * halves the remaining pointer-chain depth each round, so convergence
  * is O(log diameter) — the property that makes long chains (deep
  * near-dup clusters, session graphs) tractable at 100 TB, where a
  * 10⁶-node path would otherwise mean 10⁶ shuffle rounds.
  *
  * Per round: two key-partitioned shuffle joins + one min-aggregate.
  * Driver-side state is one Long (the changed-row count). Labels only
  * decrease and are bounded below by the component minimum, and a label
  * is always a node of the same component (neighbors share a component;
  * a label's label shares the label's component), so the unique fixpoint
  * assigns every node the component-minimum id — deterministic under any
  * partitioning or execution order.
  *
  * Every `checkpointEvery` rounds the label frame is localCheckpoint'ed.
  * This is not optional hygiene here: each round references the previous
  * round's frame FOUR times (neighbor join left+right, jump join
  * left+right), so without truncation the logical plan grows 4^rounds
  * and analysis alone OOMs the driver near round ~15. The default k=1
  * keeps the plan O(1) per round and costs one cache-read job (the
  * convergence count has already materialized the frame). k>1 trades
  * 4^k-larger analysis plans for fewer checkpoint copies — only sane for
  * tiny k. `localCheckpoint` stores blocks on executors — fast, but lost
  * with an executor; a production cluster job that must survive executor
  * loss should set a reliable `checkpointDir` and use `checkpoint`
  * instead. The loop's correctness does not depend on which variant
  * truncates the lineage.
  */
object ConnectedComponents {

  /** @param nodes  one column `node` (long), one row per vertex
    * @param edges  columns `ea`, `eb` (long) — must contain BOTH
    *               orientations of every undirected edge
    * @return (labels frame with columns `node`, `label` = min node id of
    *         the component, number of rounds run — the last round is the
    *         zero-change fixpoint check)
    */
  def run(
      nodes: DataFrame,
      edges: DataFrame,
      maxIter: Int = 50,
      checkpointEvery: Int = 1): (DataFrame, Int) = {
    var labels = nodes.select(col("node"), col("node").as("label")).persist()
    var prev: DataFrame = labels
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges.join(labels, col("eb") === col("node"))
        .groupBy(col("ea")).agg(min("label").as("nbr"))
      // stepped is self-joined on two different keys below — persist so
      // the neighbor join + aggregate run once, not twice
      val stepped = labels.join(nbrMin, col("node") === col("ea"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("mid"))
        .persist()
      val parents = stepped.select(col("node").as("pn"), col("mid").as("pl"))
      // one cached frame serves BOTH the convergence count and the next
      // label frame — no second join purely to diff old vs new
      val next = stepped.join(parents, col("mid") === col("pn"), "left")
        .select(col("node"), col("old"),
          least(col("mid"), coalesce(col("pl"), col("mid"))).as("label"))
        .persist()
      changed = next.filter(col("label") < col("old")).count()
      iter += 1
      labels = next.select(col("node"), col("label"))
      if (iter % checkpointEvery == 0) {
        // reads next from cache (the count above materialized it), then
        // pins the result as a lineage-free LogicalRDD
        labels = labels.localCheckpoint(eager = true)
        next.unpersist(blocking = false)
      }
      stepped.unpersist(blocking = false)
      prev.unpersist(blocking = false)
      prev = next
    }
    require(changed == 0,
      s"label propagation did not converge in $iter rounds (cap $maxIter)")
    (labels, iter)
  }
}
