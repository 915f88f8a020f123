package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Sketch-based approximate aggregates (SURVEY.md §2.14).
  *
  * The determinism rules (§7.5) ban approximate VALUES from crossing
  * the oracle boundary — DuckDB's sketches are different algorithms and
  * would never hash-match. These queries thread the needle: the sketch
  * result is compared against the exact answer INSIDE the query and
  * only (a) the exact values and (b) the boolean "the sketch kept its
  * error guarantee" leave the plan. The oracle recomputes the exact
  * values and pins the boolean to TRUE — so a Spark-side sketch
  * regression (or a tolerance drift) fails the hash compare, while the
  * approximate value itself stays engine-internal.
  *
  * That boolean is robust to partitioning: HLL++ registers are
  * hash-max based (order-insensitive, bit-deterministic), and any
  * legal KLL/GK-style percentile summary satisfies its rank bound by
  * construction, whatever the merge order.
  */
object SketchQueries {

  private val approxDistinct = QueryDef(
    "q_approx_distinct",
    "HyperLogLog++ distinct-user counts per event type, gated against " +
      "the exact count: the 100 TB path (approx_count_distinct merges " +
      "fixed-size registers, no distinct shuffle) must stay within 3× " +
      "the configured 5% rsd of the exact answer. Output = exact " +
      "counts + the guarantee flag; the sketch value never crosses " +
      "the engine boundary.",
    Some("""SELECT event_type,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           |       TRUE AS sketch_ok
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(lng(countDistinct(col("user_id"))).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.05).as("n_approx"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          lit(0.15) * col("n_exact")).as("sketch_ok"))
      .orderBy("event_type")
  )

  private val approxQuantile = QueryDef(
    "q_approx_quantile",
    "Approximate median of value per event type, gated by the rank " +
      "guarantee: approx_percentile(accuracy=1000) bounds rank error " +
      "by 0.1%, so the sketch median must lie between the exact p49 " +
      "and p51 quantiles (10× slack). Output = exact p49/p50/p51 " +
      "(interpolated, engine-identical under round) + the flag; the " +
      "sketch value stays engine-internal.",
    Some("""SELECT event_type,
           |       round(quantile_cont(value, 0.49), 6) AS p49,
           |       round(quantile_cont(value, 0.50), 6) AS p50,
           |       round(quantile_cont(value, 0.51), 6) AS p51,
           |       TRUE AS sketch_ok
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.49)"), 6).as("p49"),
        round(expr("percentile(value, 0.50)"), 6).as("p50"),
        round(expr("percentile(value, 0.51)"), 6).as("p51"),
        expr("approx_percentile(value, 0.5, 1000)").as("m_approx"),
        expr("percentile(value, 0.49)").as("x49"),
        expr("percentile(value, 0.51)").as("x51"))
      .select(col("event_type"), col("p49"), col("p50"), col("p51"),
        (col("m_approx") >= col("x49") && col("m_approx") <= col("x51"))
          .as("sketch_ok"))
      .orderBy("event_type")
  )

  // ---------------------------------------------------------- heavy hitters

  /** CMS geometry: d hash rows × w buckets. Collision mass per bucket
    * averages N/w; the gate allows 4·N/w — min-of-d concentrates far
    * below one mean, so the bound is structural slack, not tuning.
    */
  private val CmsD = 4
  private val CmsW = 1024

  private val heavyHitters = QueryDef(
    "q_heavy_hitters",
    "Count–min-sketch heavy hitters: the top-20 users by event count, " +
      "with the exact count AND the CMS estimate from a " +
      s"$CmsD×$CmsW counter matrix (xxhash64 rows, seeds by row " +
      "index). The counter table is built by ONE map-side-combined " +
      "aggregation over (row, bucket) — 4096 cells regardless of " +
      "corpus size, the fixed-memory frequency path at 100 TB — and " +
      "broadcast back to score candidates. Following the sketch-gate " +
      "discipline (object scaladoc), the estimate itself never " +
      "crosses the engine boundary: the query emits exact counts " +
      "plus two pinned guarantees — est ≥ exact (CMS never " +
      "underestimates; structural) and est ≤ exact + 4·N/w (4× the " +
      "mean collision mass, min-of-4 rows sits far below it).",
    Some("""WITH c AS (SELECT user_id, count(*) AS exact_count FROM events GROUP BY 1)
           |SELECT user_id, CAST(exact_count AS BIGINT) AS exact_count,
           |       TRUE AS overestimate_ok, TRUE AS bound_ok
           |FROM c ORDER BY exact_count DESC, user_id LIMIT 20""".stripMargin),
    (s, d) => {
      val e = events(s, d).select(col("user_id"))
      val rows = array((0 until CmsD).map(lit): _*)
      // counter matrix: one aggregation, ≤ CmsD·CmsW cells
      val counters = e.select(explode(rows).as("i"), col("user_id"))
        .select(col("i"), pmod(xxhash64(col("i"), col("user_id")), lit(CmsW)).as("b"))
        .groupBy("i", "b").agg(count(lit(1)).as("cell"))
      val total = e.agg(count(lit(1)).as("n_total"))
      val top = e.groupBy("user_id").agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("user_id")).limit(20)
      top.select(col("user_id"), col("exact_count"), explode(rows).as("i"))
        .select(col("user_id"), col("exact_count"), col("i"),
          pmod(xxhash64(col("i"), col("user_id")), lit(CmsW)).as("b"))
        .join(broadcast(counters), Seq("i", "b"))
        .groupBy("user_id", "exact_count")
        .agg(min(col("cell")).as("est"))
        .crossJoin(broadcast(total))
        .select(col("user_id"), lng(col("exact_count")).as("exact_count"),
          (col("est") >= col("exact_count")).as("overestimate_ok"),
          (col("est") <= col("exact_count") + expr(s"(4 * n_total) DIV $CmsW"))
            .as("bound_ok"))
        .orderBy(col("exact_count").desc, col("user_id"))
    }
  )

  /** Mergeable KMV (k-minimum-values) distinct sketch — unlike
    * q_approx_distinct's HLL (engine-internal, only GATED against the
    * exact answer), KMV built on the shared md5-48bit idiom is
    * bit-identical in both engines, so the sketch VALUES cross the
    * oracle boundary. The op demonstrates the property that makes
    * sketches the 100 TB pattern: per-group sketches (128 smallest
    * hash values) MERGE by unioning and re-taking the 128 smallest —
    * associative, bounded state, no re-scan — and the merged estimate
    * (k−1)·2⁴⁸/kth prices the whole corpus from 5 tiny sketches.
    * Groups below k fall back to exact (k_used < k ⇒ the sketch IS
    * the set). The merged k-smallest uses sort+limit
    * (TakeOrderedAndProject over ≤ 5k rows), never a global window.
    */
  private val sketchMerge = QueryDef(
    "q_sketch_merge",
    "Mergeable KMV distinct sketch: per-priority 128-minimum md5 " +
      "sketches of the order keys, merged by union + re-take — exact, " +
      "estimate, and error per group and for the merged whole.",
    Some("""WITH h AS (SELECT DISTINCT o_orderpriority AS grp,
           |             CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)) AS BIGINT) AS hv
           |           FROM orders),
           |ranked AS (SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk FROM h),
           |sk AS (SELECT grp, hv FROM ranked WHERE rk <= 128),
           |per_grp AS (
           |  SELECT grp AS scope,
           |         (SELECT CAST(count(*) AS BIGINT) FROM h h2 WHERE h2.grp = s.grp) AS n_exact,
           |         CAST(max(hv) AS BIGINT) AS kth_min, CAST(count(*) AS BIGINT) AS k_used
           |  FROM sk s GROUP BY grp),
           |mr AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rk FROM (SELECT DISTINCT hv FROM sk) u),
           |merged AS (
           |  SELECT 'ALL' AS scope, (SELECT CAST(count(DISTINCT hv) AS BIGINT) FROM h) AS n_exact,
           |         CAST(max(hv) AS BIGINT) AS kth_min, CAST(count(*) AS BIGINT) AS k_used
           |  FROM mr WHERE rk <= 128),
           |unioned AS (SELECT * FROM per_grp UNION ALL SELECT * FROM merged)
           |SELECT scope, n_exact,
           |       CASE WHEN k_used < 128 THEN CAST(n_exact AS DOUBLE)
           |            ELSE round(127.0 * 281474976710656 / kth_min, 3) END AS n_est,
           |       round(abs(CASE WHEN k_used < 128 THEN CAST(n_exact AS DOUBLE)
           |                      ELSE round(127.0 * 281474976710656 / kth_min, 3) END - n_exact)
           |             * 100.0 / n_exact, 3) AS err_pct
           |FROM unioned ORDER BY scope""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = orders(s, d).select(col("o_orderpriority").as("grp"),
          expr("CAST(conv(substr(md5(cast(o_orderkey as string)), 1, 12), 16, 10) AS BIGINT)").as("hv"))
        .distinct().persist()
      val wg = Window.partitionBy("grp").orderBy("hv")
      val sk = h.withColumn("rk", row_number().over(wg))
        .filter(col("rk") <= 128).select("grp", "hv").persist()
      val perGrp = sk.groupBy("grp")
        .agg(max("hv").as("kth_min"), lng(count(lit(1))).as("k_used"))
        .join(h.groupBy("grp").agg(lng(count(lit(1))).as("n_exact")), "grp")
        .select(col("grp").as("scope"), col("n_exact"), col("kth_min"), col("k_used"))
      // merge = union the per-group sketches, re-take the k smallest:
      // sort+limit over ≤ 5k rows (TakeOrderedAndProject, no window)
      val merged = sk.select("hv").distinct().orderBy("hv").limit(128)
        .agg(max("hv").as("kth_min"), lng(count(lit(1))).as("k_used"))
        .crossJoin(h.agg(lng(countDistinct(col("hv"))).as("n_exact")))
        .select(lit("ALL").as("scope"), col("n_exact"), col("kth_min"), col("k_used"))
      val est = when(col("k_used") < 128, dbl(col("n_exact")))
        .otherwise(round(lit(127.0) * lit(281474976710656L) / col("kth_min"), 3))
      perGrp.unionByName(merged)
        .select(col("scope"), col("n_exact"), est.as("n_est"),
          round(abs(est - col("n_exact")) * lit(100.0) / col("n_exact"), 3)
            .as("err_pct"))
        .orderBy("scope")
    }
  )

  /** Mergeable bottom-k-by-hash SAMPLING for quantiles — the quantile
    * companion to [[sketchMerge]]: the 128 events with the smallest
    * md5(event_id) per group form a uniform sample WITHOUT replacement
    * whose membership is a pure function of the data (engine-shared,
    * partition-independent), and samples merge exactly like KMV
    * sketches — union, re-take the 128 smallest. Medians (exact and
    * sampled) use the percentile ≡ quantile_cont parity q_quantiles
    * already proves. The merged re-take is sort+limit, never a global
    * window.
    */
  private val sampleQuantile = QueryDef(
    "q_sample_quantile",
    "Mergeable hash-sample quantiles: per-type 128-event bottom-k-by-" +
      "md5 samples, merged by union + re-take; exact vs sampled median " +
      "with absolute error, per group and for the merged whole.",
    Some("""WITH h AS (SELECT event_type AS grp, value,
           |             CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 12)) AS BIGINT) AS hv
           |           FROM events),
           |ranked AS (SELECT grp, value, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk FROM h),
           |samp AS (SELECT grp, value, hv FROM ranked WHERE rk <= 128),
           |per_grp AS (
           |  SELECT grp AS scope, (SELECT CAST(count(*) AS BIGINT) FROM h h2 WHERE h2.grp = s.grp) AS n,
           |         round((SELECT quantile_cont(value, 0.5) FROM h h2 WHERE h2.grp = s.grp), 6) AS exact_med,
           |         round(quantile_cont(value, 0.5), 6) AS est_med
           |  FROM samp s GROUP BY grp),
           |gs AS (SELECT value FROM (SELECT value, hv, row_number() OVER (ORDER BY hv) AS rk
           |                          FROM (SELECT DISTINCT value, hv FROM samp) u) t WHERE rk <= 128),
           |merged AS (
           |  SELECT 'ALL' AS scope, (SELECT CAST(count(*) AS BIGINT) FROM h) AS n,
           |         round((SELECT quantile_cont(value, 0.5) FROM h), 6) AS exact_med,
           |         round((SELECT quantile_cont(value, 0.5) FROM gs), 6) AS est_med)
           |SELECT scope, n, exact_med, est_med, round(abs(est_med - exact_med), 6) AS abs_err
           |FROM (SELECT * FROM per_grp UNION ALL SELECT * FROM merged) ORDER BY scope""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = events(s, d).select(col("event_type").as("grp"), col("value"),
          expr("CAST(conv(substr(md5(cast(event_id as string)), 1, 12), 16, 10) AS BIGINT)").as("hv"))
        .persist()
      val wg = Window.partitionBy("grp").orderBy("hv")
      val samp = h.withColumn("rk", row_number().over(wg))
        .filter(col("rk") <= 128).select("grp", "value", "hv").persist()
      val perGrp = h.groupBy("grp")
        .agg(lng(count(lit(1))).as("n"),
          round(expr("percentile(value, 0.5)"), 6).as("exact_med"))
        .join(samp.groupBy("grp")
          .agg(round(expr("percentile(value, 0.5)"), 6).as("est_med")), "grp")
        .select(col("grp").as("scope"), col("n"), col("exact_med"), col("est_med"))
      val merged = samp.select("value", "hv").distinct()
        .orderBy("hv").limit(128)
        .agg(round(expr("percentile(value, 0.5)"), 6).as("est_med"))
        .crossJoin(h.agg(lng(count(lit(1))).as("n"),
          round(expr("percentile(value, 0.5)"), 6).as("exact_med")))
        .select(lit("ALL").as("scope"), col("n"), col("exact_med"), col("est_med"))
      perGrp.unionByName(merged)
        .select(col("scope"), col("n"), col("exact_med"), col("est_med"),
          round(abs(col("est_med") - col("exact_med")), 6).as("abs_err"))
        .orderBy("scope")
    }
  )

  val defs: Seq[QueryDef] = Seq(approxDistinct, approxQuantile, heavyHitters,
    sketchMerge, sampleQuantile)
}
