package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.Det._

/** Exact (brute-force) matrix profile over an integer-valued series —
  * the distributed core behind q_matrix_profile (Yeh et al., ICDM'16:
  * for every length-`m` window, the z-normalized Euclidean distance
  * to its nearest non-trivial neighbor; minima = motifs, maxima =
  * discords).
  *
  * Input: (i: Long — 1-based dense index, v: DECIMAL(12,0) — the
  * series value in exact integer units, e.g. cents). Output:
  * (i, nn, dist2) per valid window, dist2 = z-normalized distance²
  * rounded to 6.
  *
  * Determinism: every window sum S_i, sum-of-squares Q_i, and sliding
  * dot product QT(i,j) is EXACT decimal arithmetic; the only doubles
  * are the final shared chain dist² = 2m(1 − (m·QT − S_i·S_j) /
  * (√(m·Q_i − S_i²)·√(m·Q_j − S_j²))), one IEEE order, rounded once —
  * so the result is bit-stable across partitionings, retries, and
  * engines (the DuckDB oracle twin mirrors the chain).
  *
  * Plan shape = the SCAMP/SCRIMP parallelization: QT along a diagonal
  * d = i−j is a sliding sum of the product series v_p·v_{p−d}, so the
  * O(n²) work partitions BY DIAGONAL — each diagonal an independent
  * windowed-sum task, exactly how GPU/cluster matrix-profile engines
  * shard. Window stats are series-sized and broadcast.
  */
object MatrixProfile {

  def profile(idxIn: DataFrame, m: Int, excl: Int): DataFrame = {
    val mL = lit(m)
    // cut the n² self-join's double-scan lineage
    val idx = idxIn.select(col("i"), col("v")).localCheckpoint()
    // window stats via a bounded range join, not an unpartitioned
    // window (PlanSpec bans the single-task sort): each window start i
    // gathers its m member rows — n·m intermediate rows, a strictly
    // smaller footprint than the n² product join below, and fully
    // partition-parallel
    val wv = idx.select(col("i").as("p"), col("v"))
      .join(broadcast(idx.select(col("i"))),
        col("p").between(col("i"), col("i") + (m - 1)))
      .groupBy("i")
      .agg(sum("v").cast(DecimalType(14, 0)).as("s"),
        sum(col("v").cast(DecimalType(25, 0)) * col("v"))
          .cast(DecimalType(27, 0)).as("q2"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") === m)
      .select("i", "s", "q2")
    val prod = idx.select(col("i").as("pi"),
        col("v").cast(DecimalType(25, 0)).as("va"))
      .crossJoin(idx.select(col("i").as("pj"), col("v").as("vb")))
      .select(col("pi"), col("pj"), (col("va") * col("vb")).as("p"))
    val dwin = Window.partitionBy(col("pi") - col("pj")).orderBy("pi")
      .rowsBetween(Window.currentRow, m - 1)
    val qt = prod
      .withColumn("qt", sum("p").over(dwin).cast(DecimalType(28, 0)))
      .withColumn("cnt", count(lit(1)).over(dwin))
      .filter(col("cnt") === m && abs(col("pi") - col("pj")) >= excl)
      .select(col("pi").as("i"), col("pj").as("j"), col("qt"))
    val pairs = qt
      .join(broadcast(wv.select(col("i"), col("s").as("si"),
        col("q2").as("qi"))), Seq("i"))
      .join(broadcast(wv.select(col("i").as("j"), col("s").as("sj"),
        col("q2").as("qj"))), Seq("j"))
    val deni = dbl(mL * col("qi") - col("si") * col("si"))
    val denj = dbl(mL * col("qj") - col("sj") * col("sj"))
    val num = dbl(mL * col("qt") - col("si") * col("sj"))
    val dist = pairs
      .filter(mL * col("qi") - col("si") * col("si") > 0 &&
        mL * col("qj") - col("sj") * col("sj") > 0)
      .select(col("i"), col("j"),
        round(lit(2.0 * m) * (lit(1.0) -
          num / (sqrt(deni) * sqrt(denj))), 6).as("d2"))
    val prof = Window.partitionBy("i").orderBy(col("d2"), col("j"))
    dist.withColumn("rk", row_number().over(prof))
      .filter(col("rk") === 1)
      .select(col("i"), lng(col("j")).as("nn"), col("d2").as("dist2"))
      .orderBy("i")
  }
}
