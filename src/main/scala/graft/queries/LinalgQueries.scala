package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Distributed linear algebra (SURVEY.md §2.25): the top principal
  * direction of the embedding corpus by power iteration — the
  * building block behind PCA whitening, spectral hashing and
  * low-rank compression of embedding tables.
  *
  * Determinism (SURVEY.md §7.5): every accumulated term is scaled to
  * integer picounts (round(·1e12) → BIGINT — round-half-away is
  * identical in both engines), so all sums are exact integer adds in
  * any order; the only doubles are the shared per-step chains
  * (long→double, ·, sqrt, ÷ — identical text both sides). Overflow
  * headroom: |x·y| ≤ 0.34 ⇒ per-cell sums stay < 2^63 up to ~27M
  * vectors; past that the same shape runs with DECIMAL partials.
  *
  * Scale shape (PLANS.md): ONE pass over the corpus builds the dims²
  * Gram aggregate — per-vector outer products generate IN-TASK from
  * the array (no exploded self-join), only the upper triangle is
  * generated (symmetry), and the aggregate map-side combines. The
  * three unrolled iterations touch 64×64 + 64-row tables with the
  * vector broadcast into each product; corpus size never appears
  * again after the first aggregation.
  */
object LinalgQueries {

  /** HALF_UP double rounding — the BigDecimal.valueOf chain Spark's and
    * DuckDB's round() apply to doubles, shared by both PCA drivers.
    */
  private def roundD(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue

  /** ONE distributed pass: the corpus Gram XᵀX as exact integer
    * picounts — upper-triangle outer products generated in-task,
    * map-side combined — collected as the (dims, dense matrix) pair
    * both PCA queries iterate on driver-side (dims² = 4096 cells, the
    * bounded-collect contract documented at [[pcaPower]]).
    */
  private def collectGram(s: org.apache.spark.sql.SparkSession,
      d: String): (Array[Int], Array[Array[Long]]) = {
    val outer = expr(
      """flatten(transform(embedding, (x, i) ->
        |  transform(slice(embedding, i + 1, size(embedding) - i), (y, j0) -> struct(
        |    i + 1 AS i, i + j0 + 1 AS j,
        |    CAST(round(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1000000000000, 0) AS BIGINT) AS p))))"""
        .stripMargin)
    val gHalf = embeddings(s, d)
      .select(col("embedding"))
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(outer).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("m"))
    val cells = gHalf.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val dims = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    val n = dims.length
    val idx = dims.zipWithIndex.toMap
    val m = Array.ofDim[Long](n, n)
    cells.foreach { case (i, j, p) =>
      m(idx(i))(idx(j)) = p
      m(idx(j))(idx(i)) = p // symmetry mirrors the lower half
    }
    (dims, m)
  }

  /** One power step w = G·v in picounts (exact integer adds). */
  private def gramStep(m: Array[Array[Long]], v: Array[Double]): Array[Long] = {
    val n = v.length
    Array.tabulate(n) { i =>
      var acc = 0L
      var j = 0
      while (j < n) {
        acc += roundD(m(i)(j).toDouble / 1000000000000L * v(j) *
          1000000000000L, 0).toLong
        j += 1
      }
      acc
    }
  }

  private def picountNorm(w: Array[Long]): Double = {
    var acc = 0L
    var i = 0
    while (i < w.length) {
      val wd = w(i).toDouble / 1000000000000L
      acc += roundD(wd * wd * 1000000000000L, 0).toLong
      i += 1
    }
    math.sqrt(acc.toDouble / 1000000000000L)
  }

  private def picountRenorm(w: Array[Long], scale: Int): Array[Double] = {
    val nn = picountNorm(w)
    w.map(x => roundD(x.toDouble / 1000000000000L / nn, scale))
  }

  private val pcaPower = QueryDef(
    "q_pca_power",
    "Top principal direction of the (uncentered) embedding corpus " +
      "via 3 unrolled power iterations on the Gram matrix G = XᵀX: " +
      "G builds in ONE corpus pass — upper-triangle outer-product " +
      "terms generated in-task from each vector (symmetry gives the " +
      "lower half for free), accumulated as exact integer picount " +
      "sums, map-side combined; each iteration multiplies the 64-row " +
      "broadcast vector into the 4096-cell G and renormalizes with a " +
      "shared sqrt chain. Emits the unit direction with its " +
      "eigenvalue estimate (the norm of the last unnormalized " +
      "iterate) — the spectral summary run before whitening or " +
      "compressing an embedding table. The oracle replays the " +
      "identical arithmetic with the full (i,j) unnest join, equal " +
      "because multiplication commutes cell-for-cell.",
    Some("""WITH el AS (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
           |              CAST(unnest(embedding) AS DOUBLE) AS x
           |            FROM embeddings),
           |g AS (SELECT a.i AS i, b.i AS j,
           |        sum(CAST(round(a.x * b.x * 1000000000000, 0) AS BIGINT)) AS m
           |      FROM el a JOIN el b ON a.vec_id = b.vec_id
           |      GROUP BY 1, 2),
           |v0 AS (SELECT i AS j, 0.125 AS v FROM (SELECT DISTINCT i FROM g)),
           |w1 AS (SELECT g.i, sum(CAST(round(CAST(g.m AS DOUBLE) / 1000000000000 * v0.v * 1000000000000, 0) AS BIGINT)) AS w
           |       FROM g JOIN v0 ON g.j = v0.j GROUP BY 1),
           |nn1 AS (SELECT sqrt(CAST(sum(CAST(round((CAST(w AS DOUBLE) / 1000000000000) * (CAST(w AS DOUBLE) / 1000000000000) * 1000000000000, 0) AS BIGINT)) AS DOUBLE) / 1000000000000) AS n FROM w1),
           |v1 AS (SELECT w1.i AS j, round(CAST(w1.w AS DOUBLE) / 1000000000000 / nn1.n, 9) AS v FROM w1, nn1),
           |w2 AS (SELECT g.i, sum(CAST(round(CAST(g.m AS DOUBLE) / 1000000000000 * v1.v * 1000000000000, 0) AS BIGINT)) AS w
           |       FROM g JOIN v1 ON g.j = v1.j GROUP BY 1),
           |nn2 AS (SELECT sqrt(CAST(sum(CAST(round((CAST(w AS DOUBLE) / 1000000000000) * (CAST(w AS DOUBLE) / 1000000000000) * 1000000000000, 0) AS BIGINT)) AS DOUBLE) / 1000000000000) AS n FROM w2),
           |v2 AS (SELECT w2.i AS j, round(CAST(w2.w AS DOUBLE) / 1000000000000 / nn2.n, 9) AS v FROM w2, nn2),
           |w3 AS (SELECT g.i, sum(CAST(round(CAST(g.m AS DOUBLE) / 1000000000000 * v2.v * 1000000000000, 0) AS BIGINT)) AS w
           |       FROM g JOIN v2 ON g.j = v2.j GROUP BY 1),
           |nn3 AS (SELECT sqrt(CAST(sum(CAST(round((CAST(w AS DOUBLE) / 1000000000000) * (CAST(w AS DOUBLE) / 1000000000000) * 1000000000000, 0) AS BIGINT)) AS DOUBLE) / 1000000000000) AS n FROM w3)
           |SELECT CAST(w3.i AS BIGINT) AS dim,
           |       round(CAST(w3.w AS DOUBLE) / 1000000000000 / nn3.n, 6) AS loading,
           |       round(nn3.n, 3) AS eigenvalue_est
           |FROM w3, nn3 ORDER BY dim""".stripMargin),
    (s, d) => {
      import s.implicits._
      // The corpus appears in exactly ONE distributed aggregation
      // ([[collectGram]]); what remains is dim(dim+1)/2 cells (64 dims
      // → 2080 rows) — a bounded driver collect (Sequence.scala's
      // precedent), far cheaper than running 3 iterations × (join +
      // agg + norm + renormalize) as ~12 separate Spark jobs over
      // 64-row tables, which was pure scheduling overhead (~6 s of
      // wall-clock for ~16 KB of state). Arithmetic mirrors the former
      // Spark expression chain operation-for-operation (same
      // left-to-right IEEE order, same BigDecimal.valueOf HALF_UP
      // rounding Spark's round() applies to doubles), so the output is
      // bit-identical to the distributed formulation and to the oracle.
      val (dims, m) = collectGram(s, d)
      val n = dims.length
      val w1 = gramStep(m, Array.fill(n)(0.125))
      val w2 = gramStep(m, picountRenorm(w1, 9))
      val w3 = gramStep(m, picountRenorm(w2, 9))
      val nn3 = picountNorm(w3)
      val loadings = picountRenorm(w3, 6)
      dims.indices.map(k => (dims(k).toLong, loadings(k), roundD(nn3, 3)))
        .toDF("dim", "loading", "eigenvalue_est")
        .orderBy("dim")
    }
  )

  /** Top-k components: [[PcaK]]-vector orthogonal iteration — per
    * component 3 power steps on the SAME one-pass Gram, each step
    * classical-Gram-Schmidt-projected against every already-extracted
    * component (computed on the raw step output, all dots from the
    * pre-projection iterate), all in the picount integer discipline so
    * both engines' sums are order-free. Component 0 is therefore
    * EXACTLY q_pca_power's direction; each later one converges to the
    * dominant direction of the orthogonal complement, so eigenvalue
    * estimates come out non-increasing (PcaTopkSpec pins ordering and
    * pairwise orthogonality ≤ 1e-5).
    */
  private val PcaK = 4
  private val PcaIters = 3

  /** Generated oracle: the [[pcaPower]] CTE chain replayed per
    * component with Gram-Schmidt subtraction CTEs between step and
    * normalization — built by the same loop indices as the driver, so
    * the two cannot drift.
    */
  private def pcaTopkDuck: String = {
    val U = "1000000000000"
    def w(c: Int, t: Int) = s"w${c}_$t"
    def sb = new StringBuilder
    val b = sb
    b ++= """WITH el AS (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i,
            |              CAST(unnest(embedding) AS DOUBLE) AS x
            |            FROM embeddings),
            |g AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
            |        sum(CAST(round(a.x * b.x * 1000000000000, 0) AS BIGINT)) AS m
            |      FROM el a JOIN el b ON a.vec_id = b.vec_id
            |      GROUP BY 1, 2),
            |dims AS MATERIALIZED (SELECT DISTINCT i AS j FROM g),
            |""".stripMargin
    for (c <- 0 until PcaK) {
      b ++= s"v${c}_0 AS MATERIALIZED (SELECT j, 0.125 AS v FROM dims),\n"
      for (t <- 1 to PcaIters) {
        // raw power step
        b ++= s"${w(c, t)}r AS MATERIALIZED (SELECT g.i, sum(CAST(round(CAST(g.m AS DOUBLE) / $U * v.v * $U, 0) AS BIGINT)) AS w" +
          s" FROM g JOIN v${c}_${t - 1} v ON g.j = v.j GROUP BY 1),\n"
        if (c == 0) {
          b ++= s"${w(c, t)} AS MATERIALIZED (SELECT i, w FROM ${w(c, t)}r),\n"
        } else {
          // classical GS: every dot taken against the RAW step output
          for (p <- 0 until c)
            b ++= s"d${c}_${t}_$p AS MATERIALIZED (SELECT sum(CAST(round((CAST(w.w AS DOUBLE) / $U) * f.v * $U, 0) AS BIGINT)) AS d" +
              s" FROM ${w(c, t)}r w JOIN vf$p f ON f.j = w.i),\n"
          val subs = (0 until c).map(p =>
            s" - CAST(round(CAST(d$p.d AS DOUBLE) / $U * f$p.v * $U, 0) AS BIGINT)").mkString
          val joins = (0 until c).map(p =>
            s" JOIN vf$p f$p ON f$p.j = w.i CROSS JOIN d${c}_${t}_$p d$p").mkString
          b ++= s"${w(c, t)} AS MATERIALIZED (SELECT w.i, w.w$subs AS w FROM ${w(c, t)}r w$joins),\n"
        }
        b ++= s"nn${c}_$t AS MATERIALIZED (SELECT sqrt(CAST(sum(CAST(round((CAST(w AS DOUBLE) / $U) * (CAST(w AS DOUBLE) / $U) * $U, 0) AS BIGINT)) AS DOUBLE) / $U) AS n FROM ${w(c, t)}),\n"
        if (t < PcaIters)
          b ++= s"v${c}_$t AS MATERIALIZED (SELECT w.i AS j, round(CAST(w.w AS DOUBLE) / $U / nn.n, 9) AS v FROM ${w(c, t)} w, nn${c}_$t nn),\n"
      }
      b ++= s"vf$c AS MATERIALIZED (SELECT w.i AS j, round(CAST(w.w AS DOUBLE) / $U / nn.n, 9) AS v FROM ${w(c, PcaIters)} w, nn${c}_$PcaIters nn),\n"
      b ++= s"out$c AS (SELECT CAST($c AS BIGINT) AS component, CAST(w.i AS BIGINT) AS dim, " +
        s"round(CAST(w.w AS DOUBLE) / $U / nn.n, 6) AS loading, round(nn.n, 3) AS eigenvalue_est " +
        s"FROM ${w(c, PcaIters)} w, nn${c}_$PcaIters nn),\n"
    }
    b.setLength(b.length - 2) // trailing ",\n"
    b ++= "\n" + (0 until PcaK).map(c => s"SELECT * FROM out$c")
      .mkString("", " UNION ALL ", " ORDER BY component, dim")
    b.result()
  }

  private val pcaTopk = QueryDef(
    "q_pca_topk",
    s"Top-$PcaK principal components by orthogonal iteration on the " +
      "one-pass exact-picount Gram: per component 3 power steps, each " +
      "classical-Gram-Schmidt-projected against the already-extracted " +
      "components (dots and subtractions in the same integer-picount " +
      "grid), then renormalized; component 0 equals q_pca_power " +
      "exactly, eigenvalue estimates come out non-increasing, and " +
      "pairwise orthogonality is spec-pinned. The corpus is touched " +
      "ONCE; all iteration state is dims-sized.",
    Some(pcaTopkDuck),
    (s, d) => {
      import s.implicits._
      val (dims, m) = collectGram(s, d)
      val n = dims.length
      val out = Seq.newBuilder[(Long, Long, Double, Double)]
      var prev = List.empty[Array[Double]] // vf vectors, 9-rounded
      for (c <- 0 until PcaK) {
        var v = Array.fill(n)(0.125)
        var w: Array[Long] = null
        for (t <- 1 to PcaIters) {
          w = gramStep(m, v)
          // classical GS: all dots from the raw step output (matches
          // the generated oracle's d-CTEs, which join the r-step)
          val dots = prev.map { f =>
            var acc = 0L
            var i = 0
            while (i < n) {
              acc += roundD(w(i).toDouble / 1000000000000L * f(i) *
                1000000000000L, 0).toLong
              i += 1
            }
            acc
          }
          prev.zip(dots).foreach { case (f, dp) =>
            var i = 0
            while (i < n) {
              w(i) -= roundD(dp.toDouble / 1000000000000L * f(i) *
                1000000000000L, 0).toLong
              i += 1
            }
          }
          if (t < PcaIters) v = picountRenorm(w, 9)
        }
        val nn = picountNorm(w)
        val l6 = picountRenorm(w, 6)
        prev = prev :+ picountRenorm(w, 9)
        dims.indices.foreach { k =>
          out += ((c.toLong, dims(k).toLong, l6(k), roundD(nn, 3)))
        }
      }
      out.result().toDF("component", "dim", "loading", "eigenvalue_est")
        .orderBy("component", "dim")
    }
  )

  /** Shared Cramer 3×3 determinant texts for [[ridgeSolve]] — ONE
    * string each, spliced into BOTH the Spark selectExpr and the
    * DuckDB oracle so the IEEE multiply/add tree is lexically
    * identical in the two engines (A is symmetric: a21=a12, a31=a13,
    * a32=a23; Det1/2/3 replace column i with b).
    */
  private val DetA =
    "(a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13) + a13*(a12*a23 - a22*a13))"
  private val Det1 =
    "(b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3) + a13*(b2*a23 - a22*b3))"
  private val Det2 =
    "(a11*(b2*a33 - a23*b3) - b1*(a12*a33 - a23*a13) + a13*(a12*b3 - b2*a13))"
  private val Det3 =
    "(a11*(a22*b3 - b2*a23) - a12*(a12*b3 - b2*a13) + b1*(a12*a23 - a22*a13))"

  /** Closed-form ridge regression by distributed normal equations —
    * the EXACT-solve member next to [[pcaPower]]'s iterative one:
    * y = w0 + w1·quantity + w2·discount over lineitem with λ = 10 on
    * the full diagonal (intercept included — symmetric formula,
    * documented trade). The whole regression reduces to ONE
    * map-side-combined pass building the 3×3 Gram + moment vector as
    * exact DECIMAL sums (constant state — the canonical "big data,
    * small model" normal-equations shape), a single-row Cramer solve,
    * and one broadcast-weights residual pass for train RMSE.
    *
    * Determinism: every Gram entry is an exact decimal sum (order
    * free); the solve is one shared double expression tree per
    * coefficient ([[DetA]]..[[Det3]] — lexically identical in both
    * engines), rounded 9; residual squares round to the 2-grid
    * (~1e10 magnitude — 12 significant digits, inside double's exact
    * range; the q_adaboost_round magnitude rule) and sum as exact
    * DECIMAL. Guard: nullif(det, 0) for a degenerate design matrix.
    *
    * Scale: two fact passes, no shuffle wider than one row, model =
    * 3 numbers. 100× data changes nothing but the scan time.
    */
  private val ridgeSolve = QueryDef(
    "q_ridge_solve",
    "Closed-form ridge regression (lambda = 10) of extendedprice on " +
      "quantity and discount via distributed normal equations: one " +
      "exact-decimal Gram pass, a shared-text 3x3 Cramer solve " +
      "(9-grid coefficients), and a broadcast-weights residual pass " +
      "for the 6-grid train RMSE.",
    Some(s"""WITH g AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n,
            |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx1,
            |         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
            |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s11,
            |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s12,
            |         CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s22,
            |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
            |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s1y,
            |         CAST(sum(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s2y
            |  FROM lineitem),
            |a AS (SELECT n, CAST(n AS DOUBLE) + 10 AS a11, sx1 AS a12, sx2 AS a13,
            |             s11 + 10 AS a22, s12 AS a23, s22 + 10 AS a33,
            |             sy AS b1, s1y AS b2, s2y AS b3 FROM g),
            |w AS (SELECT n, round($Det1 / nullif($DetA, 0), 9) AS w0,
            |             round($Det2 / nullif($DetA, 0), 9) AS w1,
            |             round($Det3 / nullif($DetA, 0), 9) AS w2 FROM a),
            |r0 AS (SELECT w.n, w.w0, w.w1, w.w2,
            |              CAST(l_extendedprice AS DOUBLE)
            |              - (w.w0 + w.w1 * CAST(l_quantity AS DOUBLE)
            |                 + w.w2 * CAST(l_discount AS DOUBLE)) AS resid
            |       FROM lineitem CROSS JOIN w)
            |SELECT n, w0, w1, w2,
            |       round(sqrt(CAST(sum(CAST(round(resid * resid, 2) AS DECIMAL(28,2))) AS DOUBLE) / n), 6) AS rmse
            |FROM r0 GROUP BY n, w0, w1, w2""".stripMargin),
    (s, d) => {
      val li = lineitem(s, d)
        .select(money(col("l_quantity")).as("x1"),
          money(col("l_discount")).as("x2"),
          money(col("l_extendedprice")).as("y"))
      val g = li.agg(lng(count(lit(1))).as("n"),
        dbl(sum(col("x1"))).as("sx1"), dbl(sum(col("x2"))).as("sx2"),
        dbl(sum(col("x1") * col("x1"))).as("s11"),
        dbl(sum(col("x1") * col("x2"))).as("s12"),
        dbl(sum(col("x2") * col("x2"))).as("s22"),
        dbl(sum(col("y"))).as("sy"),
        dbl(sum(col("x1") * col("y"))).as("s1y"),
        dbl(sum(col("x2") * col("y"))).as("s2y"))
      val a = g.selectExpr("n", "CAST(n AS DOUBLE) + 10 AS a11",
        "sx1 AS a12", "sx2 AS a13", "s11 + 10 AS a22", "s12 AS a23",
        "s22 + 10 AS a33", "sy AS b1", "s1y AS b2", "s2y AS b3")
      val w = a.selectExpr("n",
        s"round($Det1 / nullif($DetA, 0), 9) AS w0",
        s"round($Det2 / nullif($DetA, 0), 9) AS w1",
        s"round($Det3 / nullif($DetA, 0), 9) AS w2")
      val resid = dbl(col("l_extendedprice")) -
        (col("w0") + col("w1") * dbl(col("l_quantity"))
          + col("w2") * dbl(col("l_discount")))
      lineitem(s, d).select("l_quantity", "l_discount", "l_extendedprice")
        .crossJoin(broadcast(w))
        .select(col("n"), col("w0"), col("w1"), col("w2"),
          round(resid * resid, 2).cast("decimal(28,2)").as("term"))
        .groupBy("n", "w0", "w1", "w2")
        .agg(round(sqrt(dbl(sum(col("term"))) / col("n")), 6).as("rmse"))
    }
  )

  val defs: Seq[QueryDef] = Seq(pcaPower, pcaTopk, ridgeSolve)
}
