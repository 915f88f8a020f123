package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Statistical / data-quality operators: one-pass table profiling,
  * chi-square contingency analysis, lag-1 autocorrelation, winsorized
  * (percentile-clipped) aggregation, and a 2-D Pareto frontier
  * (skyline).
  *
  * Determinism (SURVEY.md §7.5): every statistic is assembled from
  * exact integer / DECIMAL sums with at most a fixed, shared chain of
  * IEEE double operations applied once at the end (division, sqrt —
  * both correctly rounded, so identical across engines given identical
  * exact inputs). Nothing here sums raw doubles.
  *
  * Scale shapes (PLANS.md): profiling is a single pass (Expand for the
  * multi-distinct); the contingency / autocorrelation joins touch only
  * tiny aggregate tables (≤ types × cohorts rows); winsorize joins a
  * broadcastable ≤5-row bounds table back to the fact; the skyline is
  * range-bucketed so no window ever sees a single global partition.
  */
object StatsQueries {

  // ---------------------------------------------------------------- profile

  /** Engine-identical string rendering per column type (doubles via
    * DECIMAL(18,2), timestamps via yyyy-MM-dd) — both engines render
    * the same decimal / date the same way, while raw double→string
    * formatting would differ.
    */
  private val profile = QueryDef(
    "q_profile",
    "One-pass data profiling of the orders table: per column, null " +
      "count, exact distinct count, and min/max rendered engine-" +
      "identically (numerics as-is, money via DECIMAL(18,2), dates as " +
      "yyyy-MM-dd). Spark computes all six columns' statistics in a " +
      "single aggregation (Catalyst Expand handles the multi-distinct " +
      "in one scan) and unpivots the result with one explode — the " +
      "profile-before-you-train pass every pipeline runs; at 100 TB " +
      "the same shape runs with approx_count_distinct when a sketch " +
      "is acceptable. The oracle recomputes each column's row with a " +
      "separate aggregate and unions them.",
    Some("""SELECT 'o_custkey' AS col_name,
           |       CAST(count(*) - count(o_custkey) AS BIGINT) AS n_nulls,
           |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
           |       CAST(min(o_custkey) AS VARCHAR) AS min_repr,
           |       CAST(max(o_custkey) AS VARCHAR) AS max_repr FROM orders
           |UNION ALL
           |SELECT 'o_orderdate', CAST(count(*) - count(o_orderdate) AS BIGINT),
           |       CAST(count(DISTINCT o_orderdate) AS BIGINT),
           |       strftime(min(o_orderdate), '%Y-%m-%d'),
           |       strftime(max(o_orderdate), '%Y-%m-%d') FROM orders
           |UNION ALL
           |SELECT 'o_orderkey', CAST(count(*) - count(o_orderkey) AS BIGINT),
           |       CAST(count(DISTINCT o_orderkey) AS BIGINT),
           |       CAST(min(o_orderkey) AS VARCHAR),
           |       CAST(max(o_orderkey) AS VARCHAR) FROM orders
           |UNION ALL
           |SELECT 'o_orderpriority', CAST(count(*) - count(o_orderpriority) AS BIGINT),
           |       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           |       min(o_orderpriority), max(o_orderpriority) FROM orders
           |UNION ALL
           |SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
           |       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           |       min(o_orderstatus), max(o_orderstatus) FROM orders
           |UNION ALL
           |SELECT 'o_totalprice', CAST(count(*) - count(o_totalprice) AS BIGINT),
           |       CAST(count(DISTINCT o_totalprice) AS BIGINT),
           |       CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           |       CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
           |FROM orders
           |ORDER BY col_name""".stripMargin),
    (s, d) => {
      // fixed-count repartition: the 6-way multi-distinct Expand
      // multiplies every row x7 before aggregating — the heaviest
      // per-row chain on orders, serialized by the single input split
      // at bench scale (SURVEY §4.2 r9 trap; profiled 2.8 s one-task)
      val o = orders(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("o_orderkey"))
      def longRepr(c: String)  = (min(col(c)).cast("string"), max(col(c)).cast("string"))
      def strRepr(c: String)   = (min(col(c)), max(col(c)))
      def moneyRepr(c: String) = (min(money(col(c))).cast("string"), max(money(col(c))).cast("string"))
      def dateRepr(c: String)  = (dateStr(min(col(c))), dateStr(max(col(c))))
      val cols: Seq[(String, (org.apache.spark.sql.Column, org.apache.spark.sql.Column))] = Seq(
        "o_custkey" -> longRepr("o_custkey"),
        "o_orderdate" -> dateRepr("o_orderdate"),
        "o_orderkey" -> longRepr("o_orderkey"),
        "o_orderpriority" -> strRepr("o_orderpriority"),
        "o_orderstatus" -> strRepr("o_orderstatus"),
        "o_totalprice" -> moneyRepr("o_totalprice"))
      // one aggregation row carrying every statistic, then explode
      val aggExprs = cols.flatMap { case (c, (mn, mx)) => Seq(
        lng(count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        lng(countDistinct(col(c))).as(s"${c}__nd"),
        mn.as(s"${c}__mn"), mx.as(s"${c}__mx"))
      }
      val one = o.agg(aggExprs.head, aggExprs.tail: _*)
      val rows = array(cols.map { case (c, _) => struct(
        lit(c).as("col_name"), col(s"${c}__nn").as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"), col(s"${c}__mn").as("min_repr"),
        col(s"${c}__mx").as("max_repr"))
      }: _*)
      one.select(explode(rows).as("r"))
        .select(col("r.col_name"), col("r.n_nulls"), col("r.n_distinct"),
          col("r.min_repr"), col("r.max_repr"))
        .orderBy("col_name")
    }
  )

  // ------------------------------------------------------------------ chisq

  private val chisq = QueryDef(
    "q_chisq",
    "Chi-square contingency analysis of event_type × user cohort " +
      "(user_id mod 3): per cell, the observed count, the expected " +
      "count in exact integer millis (1000·R·C floor-div N — floor " +
      "division has no cross-engine rounding ties), and the chi-square " +
      "contribution (O−E)²/E computed as the single IEEE division " +
      "(O·N−R·C)² / (N·R·C) of two exact BIGINTs. The statistic is the " +
      "sum of the 15 contributions — left to the consumer because a " +
      "float sum's order is engine-dependent; the per-cell table is " +
      "the useful artifact anyway (it names the deviating cells). " +
      "Row/column totals are ≤5-row broadcast joins onto the cell " +
      "table; nothing beyond the first aggregation touches the fact.",
    Some("""WITH cells AS (SELECT event_type, user_id % 3 AS cohort, count(*) AS o
           |               FROM events GROUP BY 1, 2),
           |r AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
           |c AS (SELECT cohort, sum(o) AS c FROM cells GROUP BY 1),
           |n AS (SELECT sum(o) AS n FROM cells)
           |SELECT cells.event_type, CAST(cells.cohort AS BIGINT) AS cohort,
           |       CAST(cells.o AS BIGINT) AS n_obs,
           |       CAST(1000 * r.r * c.c // n.n AS BIGINT) AS e_milli,
           |       round(CAST((cells.o * n.n - r.r * c.c) * (cells.o * n.n - r.r * c.c) AS DOUBLE)
           |             / CAST(n.n * r.r * c.c AS DOUBLE), 6) AS contrib
           |FROM cells JOIN r USING (event_type) JOIN c USING (cohort) CROSS JOIN n
           |ORDER BY event_type, cohort""".stripMargin),
    (s, d) => {
      val cells = events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 3).as("cohort"))
        .agg(count(lit(1)).as("o"))
      val r = cells.groupBy("event_type").agg(sum("o").as("r"))
      val c = cells.groupBy("cohort").agg(sum("o").as("c"))
      val n = cells.agg(sum("o").as("n"))
      val diff = col("o") * col("n") - col("r") * col("c")
      cells.join(broadcast(r), "event_type").join(broadcast(c), "cohort")
        .crossJoin(broadcast(n))
        .select(col("event_type"), lng(col("cohort")).as("cohort"),
          lng(col("o")).as("n_obs"),
          lng(expr("1000 * r * c DIV n")).as("e_milli"),
          round(dbl(diff * diff) / dbl(col("n") * col("r") * col("c")), 6)
            .as("contrib"))
        .orderBy("event_type", "cohort")
    }
  )

  // --------------------------------------------------------------- autocorr

  private val autocorr = QueryDef(
    "q_autocorr",
    "Lag-1 autocorrelation of hourly event counts per type — the " +
      "seasonality screen run before windowing a time series into " +
      "training examples. Hourly counts are exact integers; adjacent-" +
      "hour pairs come from a lag window restricted to truly " +
      "consecutive hours (a gap breaks the pair, it does not smear); " +
      "Pearson r is assembled from six exact BIGINT co-moment sums " +
      "with one shared double chain — (nΣxy−ΣxΣy)/sqrt((nΣx²−(Σx)²)·" +
      "(nΣy²−(Σy)²)) — so both engines emit the identical double " +
      "(same q_corr discipline). The lag window partitions by " +
      "event_type over the tiny hour×type aggregate, never the fact.",
    Some("""WITH h AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |             count(*) AS cnt
           |           FROM events GROUP BY 1, 2),
           |p AS (SELECT event_type, cnt AS x,
           |        lag(cnt) OVER (PARTITION BY event_type ORDER BY hr) AS y,
           |        hr - lag(hr) OVER (PARTITION BY event_type ORDER BY hr) AS gap
           |      FROM h),
           |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           |        sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy
           |      FROM p WHERE y IS NOT NULL AND gap = 1 GROUP BY 1)
           |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
           |       CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
           |            ELSE round(CAST(n*sxy - sx*sy AS DOUBLE)
           |                       / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
           |                              * CAST(n*syy - sy*sy AS DOUBLE)), 6)
           |       END AS r
           |FROM m ORDER BY event_type""".stripMargin),
    (s, d) => {
      val hourExpr =
        "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val h = events(s, d)
        .groupBy(col("event_type"), expr(hourExpr).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("hr")
      val p = h.select(col("event_type"), col("cnt").as("x"),
          lag("cnt", 1).over(w).as("y"),
          (col("hr") - lag("hr", 1).over(w)).as("gap"))
        .filter(col("y").isNotNull && col("gap") === 1)
      val m = p.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val d1 = col("n") * col("sxx") - col("sx") * col("sx")
      val d2 = col("n") * col("syy") - col("sy") * col("sy")
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      // separate zero checks: the BIGINT product d1·d2 overflows Long
      // (ANSI throw) once the series is long/bursty enough
      m.select(col("event_type"), lng(col("n")).as("n_pairs"),
          when(d1 === 0 || d2 === 0, lit(null))
            .otherwise(round(dbl(num) / sqrt(dbl(d1) * dbl(d2)), 6)).as("r"))
        .orderBy("event_type")
    }
  )

  // -------------------------------------------------------------- winsorize

  private val winsorize = QueryDef(
    "q_winsorize",
    "Winsorized aggregation: per order priority, o_totalprice clipped " +
      "to its group's exact interpolated [p05, p95] (percentile ⇔ " +
      "quantile_cont — shared definition, q_quantiles precedent), then " +
      "count, clip counts, and the winsorized mean. Clipped values are " +
      "interpolated doubles, so they are cast to DECIMAL(18,6) BEFORE " +
      "summing (both engines round the same double to the same " +
      "decimal; exact addition kills float order-dependence) and the " +
      "mean is one division at the end. Shape: one aggregation for the " +
      "≤5-row bounds table, broadcast back onto the fact, one final " +
      "aggregation — the outlier-robust statistics pass.",
    Some("""WITH b AS (SELECT o_orderpriority,
           |             quantile_cont(o_totalprice, 0.05) AS lo,
           |             quantile_cont(o_totalprice, 0.95) AS hi
           |           FROM orders GROUP BY 1)
           |SELECT o.o_orderpriority,
           |       CAST(count(*) AS BIGINT) AS n,
           |       CAST(count(*) FILTER (WHERE o.o_totalprice < b.lo) AS BIGINT) AS n_clip_lo,
           |       CAST(count(*) FILTER (WHERE o.o_totalprice > b.hi) AS BIGINT) AS n_clip_hi,
           |       round(CAST(sum(CAST(least(greatest(o.o_totalprice, b.lo), b.hi) AS DECIMAL(18,6))) AS DOUBLE)
           |             / count(*), 6) AS winsor_mean
           |FROM orders o JOIN b USING (o_orderpriority)
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
      val b = o.groupBy("o_orderpriority").agg(
        expr("percentile(o_totalprice, 0.05)").as("lo"),
        expr("percentile(o_totalprice, 0.95)").as("hi"))
      val clipped = least(greatest(col("o_totalprice"), col("lo")), col("hi"))
        .cast(org.apache.spark.sql.types.DecimalType(18, 6))
      o.join(broadcast(b), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(lng(count(lit(1))).as("n"),
          lng(count(when(col("o_totalprice") < col("lo"), 1))).as("n_clip_lo"),
          lng(count(when(col("o_totalprice") > col("hi"), 1))).as("n_clip_hi"),
          round(dbl(sum(clipped)) / count(lit(1)), 6).as("winsor_mean"))
        .orderBy("o_orderpriority")
    }
  )

  // ---------------------------------------------------------------- skyline

  private val skyline = QueryDef(
    "q_skyline",
    "2-D Pareto frontier (skyline) of orders: keep an order iff no " +
      "other order has BOTH a strictly later date AND a strictly " +
      "higher price — the multi-objective shortlist query. Scale " +
      "shape: the prefix-max over later dates is computed on the " +
      "per-day aggregate, range-BUCKETED (day DIV 256) so every " +
      "window is partitioned (no single-partition global sort, " +
      "PlanSpec-gated for the whole inventory): within-bucket prefix " +
      "max by window, cross-bucket max from a tiny bucket-level self-" +
      "join, thresholds joined back to the fact by day. Dominance " +
      "compares 2-decimal doubles — exact. The oracle computes the " +
      "same frontier with one descending RANGE window over days.",
    Some("""WITH o AS (SELECT o_orderkey,
           |             epoch_us(o_orderdate) // 86400000000 AS day,
           |             o_totalprice AS price
           |           FROM orders),
           |thr AS (SELECT day,
           |          max(max(price)) OVER (ORDER BY day DESC
           |            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS later_max
           |        FROM o GROUP BY day)
           |SELECT o.o_orderkey,
           |       strftime(make_timestamp(o.day * 86400000000), '%Y-%m-%d') AS o_date,
           |       o.price AS o_totalprice
           |FROM o JOIN thr USING (day)
           |WHERE thr.later_max IS NULL OR o.price >= thr.later_max
           |ORDER BY o.o_orderkey""".stripMargin),
    (s, d) => {
      // o_orderdate is TIMESTAMP_NTZ in the parquet; session TZ is UTC so
      // the cast to TIMESTAMP is the identity both engines apply
      val dayExpr = "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) - " +
        "pmod(unix_micros(CAST(o_orderdate AS TIMESTAMP)), 86400000000)) DIV 86400000000"
      val o = orders(s, d)
        .select(col("o_orderkey"), expr(dayExpr).as("day"),
          col("o_totalprice").as("price"))
      val byDay = o.groupBy("day").agg(max("price").as("dmax"))
        .withColumn("bucket", expr("day DIV 256"))
      // within-bucket: max over strictly-later days (days are distinct
      // rows here, so ROWS ... 1 PRECEDING under day DESC is exact)
      val wIn = Window.partitionBy("bucket").orderBy(col("day").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val inBucket = byDay.withColumn("in_max", max("dmax").over(wIn))
      // cross-bucket: max over all strictly-later buckets (tiny table)
      val bmax = byDay.groupBy("bucket").agg(max("dmax").as("bmax"))
      val later = bmax.as("a")
        .join(bmax.as("b"), col("b.bucket") > col("a.bucket"))
        .groupBy(col("a.bucket").as("bucket"))
        .agg(max(col("b.bmax")).as("later_bucket_max"))
      val thr = inBucket.join(broadcast(later), Seq("bucket"), "left")
        .select(col("day"),
          greatest(coalesce(col("in_max"), lit(Double.MinValue)),
            coalesce(col("later_bucket_max"), lit(Double.MinValue)))
            .as("later_max"),
          (col("in_max").isNull && col("later_bucket_max").isNull).as("first"))
      o.join(thr, "day")
        .filter(col("first") || col("price") >= col("later_max"))
        .select(col("o_orderkey"),
          dateStr(timestamp_micros(col("day") * 86400000000L)).as("o_date"),
          col("price").as("o_totalprice"))
        .orderBy("o_orderkey")
    }
  )

  // ------------------------------------------------------------ mad outliers

  private val madOutliers = QueryDef(
    "q_mad_outliers",
    "Robust outlier detection via MAD (median absolute deviation): " +
      "per event type, the exact interpolated median of value, the " +
      "median of |value − median|, and how many events sit beyond " +
      "3·MAD — the screen that survives the heavy tails that wreck " +
      "mean/stddev z-scores (one planted outlier drags a mean; it " +
      "cannot drag a median). Two grouped exact-percentile passes " +
      "(percentile ⇔ quantile_cont, q_quantiles precedent) with the " +
      "≤5-row medians broadcast back between them; |x−med| and the " +
      "3·MAD comparison are deterministic double arithmetic on " +
      "exact-percentile outputs.",
    Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
           |             FROM events GROUP BY 1),
           |mad AS (SELECT e.event_type,
           |          quantile_cont(abs(e.value - med.med), 0.5) AS mad
           |        FROM events e JOIN med USING (event_type) GROUP BY 1)
           |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           |       round(med.med, 6) AS med, round(mad.mad, 6) AS mad,
           |       CAST(count(*) FILTER (WHERE abs(e.value - med.med) > 3 * mad.mad) AS BIGINT) AS n_outliers
           |FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
           |GROUP BY e.event_type, med.med, mad.mad
           |ORDER BY e.event_type""".stripMargin),
    (s, d) => {
      val e = events(s, d).select(col("event_type"), col("value"))
      val med = e.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val withMed = e.join(broadcast(med), "event_type")
      val mad = withMed.groupBy("event_type")
        .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
      withMed.join(broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(lng(count(lit(1))).as("n"),
          lng(count(when(abs(col("value") - col("med")) > col("mad") * 3, 1)))
            .as("n_outliers"))
        .select(col("event_type"), col("n"), round(col("med"), 6).as("med"),
          round(col("mad"), 6).as("mad"), col("n_outliers"))
        .orderBy("event_type")
    }
  )

  // -------------------------------------------------------------- cross_corr

  /** Lead–lag cross-correlation between the click and purchase hourly
    * series at lags −3..+3 — does one signal PREDICT the other, and at
    * what offset? The causal screen run before building lagged
    * features. Scale shape: the fact collapses to the hour grid first
    * (two conditional counts in ONE pass), and every lag is a
    * broadcast self-join of that bounded grid — 7 lags × hours rows,
    * never touching the fact again. Pearson per lag from exact BIGINT
    * co-moments (q_corr discipline).
    */
  private val crossCorr = QueryDef(
    "q_cross_corr",
    "Cross-correlation of click vs purchase hourly counts at lags " +
      "-3..+3: full hour grid (missing hours = 0), exact integer " +
      "co-moment sums per lag, one shared double chain for r.",
    Some("""WITH e AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h FROM events),
           |b AS (SELECT min(h) AS hmin, max(h) AS hmax FROM e),
           |hours AS (SELECT unnest(generate_series(hmin, hmax)) AS h FROM b),
           |c AS (SELECT h, CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS cx,
           |             CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS cy
           |      FROM e GROUP BY h),
           |s AS (SELECT hr.h, coalesce(c.cx, 0) AS cx, coalesce(c.cy, 0) AS cy
           |      FROM hours hr LEFT JOIN c ON c.h = hr.h),
           |lags AS (SELECT unnest(generate_series(-3, 3)) AS lag),
           |pairs AS (SELECT l.lag, a.cx, b.cy
           |          FROM lags l JOIN s a ON true JOIN s b ON b.h = a.h + l.lag),
           |m AS (SELECT lag, count(*) AS n, sum(cx) AS sx, sum(cy) AS sy,
           |        sum(cx*cy) AS sxy, sum(cx*cx) AS sxx, sum(cy*cy) AS syy
           |      FROM pairs GROUP BY lag)
           |SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
           |       CASE WHEN n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
           |            ELSE round(CAST(n*sxy - sx*sy AS DOUBLE)
           |                       / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
           |                              * CAST(n*syy - sy*sy AS DOUBLE)), 6)
           |       END AS r
           |FROM m ORDER BY lag""".stripMargin),
    (s, d) => {
      val hourExpr =
        "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val e = events(s, d)
        .select(col("event_type"), expr(hourExpr).as("h"))
      val counts = e.groupBy("h").agg(
        lng(count(when(col("event_type") === "click", 1))).as("cx"),
        lng(count(when(col("event_type") === "purchase", 1))).as("cy"))
      val grid = e.agg(min("h").as("hmin"), max("h").as("hmax"))
        .select(explode(sequence(col("hmin"), col("hmax"))).as("h"))
      val series = grid.join(counts, Seq("h"), "left")
        .select(col("h"), coalesce(col("cx"), lit(0L)).as("cx"),
          coalesce(col("cy"), lit(0L)).as("cy"))
        .persist()
      val lags = series.sparkSession.range(-3, 4).select(col("id").as("lag"))
      val pairs = series.as("a").crossJoin(broadcast(lags))
        .withColumn("bh", col("a.h") + col("lag"))
        .join(broadcast(series.select(col("h").as("bh"), col("cy").as("by"))), "bh")
        .select(col("lag"), col("a.cx").as("x"), col("by").as("y"))
      val m = pairs.groupBy("lag").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      // zero guard tests each variance factor separately: their BIGINT
      // product (~n²·var² ≈ 1e20 at sf0.1 event volumes) would overflow
      // Long under Spark 4's ANSI mode; each factor alone is ~1e10
      m.select(lng(col("lag")).as("lag"), lng(col("n")).as("n_pairs"),
          when(col("n") * col("sxx") - col("sx") * col("sx") === 0 ||
            col("n") * col("syy") - col("sy") * col("sy") === 0, lit(null))
            .otherwise(round(dbl(col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt(dbl(col("n") * col("sxx") - col("sx") * col("sx")) *
                dbl(col("n") * col("syy") - col("sy") * col("sy"))), 6))
            .as("r"))
        .orderBy("lag")
    }
  )

  /** Rank-correlation battery — Spearman's ρ and Kendall's τ between
    * two rankings of the same top-100 part set (by revenue vs by
    * shipped quantity). The go-to diagnostic when two scoring
    * functions (two rankers, two quality signals, two epochs of the
    * same model) must be compared as ORDERINGS rather than values —
    * complements q_corr (Pearson on raw values) and q_rank_fusion
    * (which merges rankings instead of comparing them).
    *
    * Determinism: both metrics rank on the exact DECIMAL aggregates
    * with partkey tie-breaks (row_number, so no tie-handling variants
    * across engines); d², concordant and discordant counts are exact
    * BIGINTs; each coefficient is ONE rounded double expression.
    *
    * Scale: the fact is aggregated once per partkey (map-side
    * combine); the top-100 selection is a TakeOrdered; every ranking
    * window and the τ pair join run on the persisted 100-row table —
    * the windows are single-partition but over a CONSTANT-bounded
    * set, and the pair join is 100×100 broadcast-nested-loop, both
    * invariant to corpus size.
    */
  private val rankCorr = QueryDef(
    "q_rank_corr",
    "Spearman ρ + Kendall τ between the revenue ranking and the " +
      "quantity ranking of the top-100 revenue parts: ρ = 1 − " +
      "6Σd²/(n(n²−1)) from exact integer rank differences, τ-a = " +
      "(C−D)/(n(n−1)/2) from the bounded pairwise comparison.",
    Some("""WITH pp AS (
           |  SELECT l_partkey,
           |         sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev,
           |         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
           |  FROM lineitem GROUP BY 1),
           |top AS (SELECT * FROM pp ORDER BY rev DESC, l_partkey LIMIT 100),
           |r AS (SELECT l_partkey,
           |        row_number() OVER (ORDER BY rev DESC, l_partkey) AS r_rev,
           |        row_number() OVER (ORDER BY qty DESC, l_partkey) AS r_qty
           |      FROM top),
           |sp AS (SELECT count(*) AS n,
           |              sum((r_rev - r_qty) * (r_rev - r_qty)) AS d2
           |       FROM r),
           |kp AS (SELECT sum(CASE WHEN (a.r_rev - b.r_rev) * (a.r_qty - b.r_qty) > 0 THEN 1 ELSE 0 END) AS conc,
           |              sum(CASE WHEN (a.r_rev - b.r_rev) * (a.r_qty - b.r_qty) < 0 THEN 1 ELSE 0 END) AS disc
           |       FROM r a JOIN r b ON a.l_partkey < b.l_partkey)
           |SELECT CAST(n AS BIGINT) AS n,
           |       CAST(conc AS BIGINT) AS concordant,
           |       CAST(disc AS BIGINT) AS discordant,
           |       round(1 - 6.0 * d2 / (n * (n * n - 1)), 6) AS spearman_rho,
           |       round(CAST(conc - disc AS DOUBLE) / (n * (n - 1) // 2), 6) AS kendall_tau
           |FROM sp CROSS JOIN kp""".stripMargin),
    (s, d) => {
      val pp = lineitem(s, d).groupBy("l_partkey")
        .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))")).as("rev"),
          sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("qty"))
      val top = pp.orderBy(col("rev").desc, col("l_partkey")).limit(100).persist()
      val r = top
        .withColumn("r_rev", row_number().over(
          Window.orderBy(col("rev").desc, col("l_partkey"))))
        .withColumn("r_qty", row_number().over(
          Window.orderBy(col("qty").desc, col("l_partkey"))))
        .select("l_partkey", "r_rev", "r_qty")
        .persist()
      val sp = r.agg(count(lit(1)).as("n"),
        sum((col("r_rev") - col("r_qty")) * (col("r_rev") - col("r_qty"))).as("d2"))
      val a = r.select(col("l_partkey").as("ak"), col("r_rev").as("ar"),
        col("r_qty").as("aq"))
      val b = r.select(col("l_partkey").as("bk"), col("r_rev").as("br"),
        col("r_qty").as("bq"))
      val sgn = (col("ar") - col("br")) * (col("aq") - col("bq"))
      val kp = a.join(broadcast(b), col("ak") < col("bk"))
        .agg(sum(when(sgn > 0, 1L).otherwise(0L)).as("conc"),
          sum(when(sgn < 0, 1L).otherwise(0L)).as("disc"))
      sp.crossJoin(broadcast(kp))
        .select(lng(col("n")).as("n"), lng(col("conc")).as("concordant"),
          lng(col("disc")).as("discordant"),
          round(lit(1) - lit(6.0) * col("d2") / (col("n") * (col("n") * col("n") - 1)), 6)
            .as("spearman_rho"),
          round(dbl(col("conc") - col("disc"))
            / (col("n") * (col("n") - 1) / 2), 6).as("kendall_tau"))
    }
  )

  // ------------------------------------------------------------ mann_whitney

  private val mannWhitney = QueryDef(
    "q_mann_whitney",
    "Mann-Whitney / Wilcoxon rank-sum test of each treatment event " +
      "type's value distribution against the 'view' control — the " +
      "nonparametric A/B readout next to q_abtest (Welch on means), " +
      "q_ks_test (CDF distance) and q_chisq (categorical): per " +
      "treatment, n's, the doubled U statistic 2U₁ = 2R₁ − n₁(n₁+1) " +
      "as an exact BIGINT (doubling keeps tie-averaged ranks integral " +
      "— a tie group's average rank is a half-integer, so 2·rank is " +
      "exact), and the tie-corrected normal z. SCALE SHAPE: ranks are " +
      "NEVER computed per row — values aggregate to a (type, value) " +
      "count table first (bounded by distinct 2-dp values, zipfian-" +
      "small at any corpus size), tie-averaged doubled ranks come " +
      "from ONE prefix-sum window over that table (2·pfx + tot + 1), " +
      "and the treatment×{t,control} pairing is a ≤|types|-row " +
      "broadcast against the value-level table — the fact table is " +
      "touched exactly once. z is one shared double chain over exact " +
      "BIGINTs, NULL-guarded on the all-tied degenerate case via the " +
      "INTEGER test ties == N³−N (a float zero-test would be engine-" +
      "dependent).",
    Some("""WITH vl AS (SELECT event_type, value, count(*) AS c FROM events
           |            WHERE value IS NOT NULL GROUP BY 1, 2),
           |tr AS (SELECT DISTINCT event_type AS treatment FROM vl
           |       WHERE event_type <> 'view'),
           |comb AS (SELECT tr.treatment, vl.value,
           |           sum(CASE WHEN vl.event_type = tr.treatment THEN vl.c ELSE 0 END) AS nt,
           |           sum(CASE WHEN vl.event_type = 'view' THEN vl.c ELSE 0 END) AS nc
           |         FROM tr JOIN vl ON vl.event_type = tr.treatment
           |                        OR vl.event_type = 'view'
           |         GROUP BY 1, 2),
           |w AS (SELECT treatment, nt, nc, nt + nc AS tot,
           |        coalesce(sum(nt + nc) OVER (PARTITION BY treatment ORDER BY value
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
           |      FROM comb),
           |m AS (SELECT treatment, sum(nt) AS n1, sum(nc) AS n2,
           |        sum(nt * (2*pfx + tot + 1)) AS r2,
           |        sum(tot*tot*tot - tot) AS ties
           |      FROM w GROUP BY 1)
           |SELECT treatment, CAST(n1 AS BIGINT) AS n_treat,
           |       CAST(n2 AS BIGINT) AS n_ctrl,
           |       CAST(r2 - n1*(n1+1) AS BIGINT) AS u2,
           |       CASE WHEN n1 = 0 OR n2 = 0
           |                 OR ties = (n1+n2)*(n1+n2)*(n1+n2) - (n1+n2) THEN NULL
           |            ELSE round((CAST(r2 - n1*(n1+1) AS DOUBLE)
           |                        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
           |                       / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 3e0
           |                              * (CAST(n1+n2+1 AS DOUBLE)
           |                                 - CAST(ties AS DOUBLE)
           |                                   / (CAST(n1+n2 AS DOUBLE)
           |                                      * CAST(n1+n2-1 AS DOUBLE)))), 6)
           |       END AS z
           |FROM m ORDER BY treatment""".stripMargin),
    (s, d) => {
      val vl = events(s, d).filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("c"))
        .persist() // two consumers (treatment list + pairing join)
      val tr = vl.filter(col("event_type") =!= "view")
        .select(col("event_type").as("treatment")).distinct()
      // ≤|types|-row treatment list broadcast against the value-level
      // aggregate (a non-equi pairing, but the nested-loop side is
      // constant-sized — never the fact table)
      val comb = broadcast(tr)
        .join(vl, vl("event_type") === col("treatment") ||
          vl("event_type") === "view")
        .groupBy(col("treatment"), col("value"))
        .agg(sum(when(col("event_type") === col("treatment"), col("c"))
          .otherwise(0L)).as("nt"),
          sum(when(col("event_type") === "view", col("c"))
            .otherwise(0L)).as("nc"))
      val w = Window.partitionBy("treatment").orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = comb
        .withColumn("tot", col("nt") + col("nc"))
        .withColumn("pfx", coalesce(sum(col("tot")).over(w), lit(0L)))
      val m = ranked.groupBy("treatment").agg(
        sum("nt").as("n1"), sum("nc").as("n2"),
        sum(col("nt") * (lit(2) * col("pfx") + col("tot") + 1)).as("r2"),
        sum(col("tot") * col("tot") * col("tot") - col("tot")).as("ties"))
      val nn = col("n1") + col("n2")
      val u2 = col("r2") - col("n1") * (col("n1") + 1)
      val z = (dbl(u2) - dbl(col("n1")) * dbl(col("n2"))) /
        sqrt(dbl(col("n1")) * dbl(col("n2")) / lit(3.0) *
          (dbl(nn + 1) - dbl(col("ties")) / (dbl(nn) * dbl(nn - 1))))
      val out = m.select(col("treatment"), lng(col("n1")).as("n_treat"),
        lng(col("n2")).as("n_ctrl"), lng(u2).as("u2"),
        when(col("n1") === 0 || col("n2") === 0 ||
          col("ties") === nn * nn * nn - nn, lit(null))
          .otherwise(round(z, 6)).as("z"))
        .orderBy("treatment")
      materializeThenRelease(out, vl)
    }
  )

  // ------------------------------------------------------------------ cusum

  private val cusum = QueryDef(
    "q_cusum",
    "One-sided CUSUM drift alarm over hourly event counts per type — " +
      "the sequential change detector next to q_changepoint (single " +
      "retrospective split) and q_psi (distribution shift): S_i = " +
      "max(0, S_{i-1} + x_i − μ − k) with allowance k = μ/4 and alarm " +
      "threshold h = 2μ. THE SCALE TRICK: the clipped recursion is " +
      "not window-expressible as written (max(0,·) is non-" +
      "associative), but S_n ≡ RS_n − min(0, min_{j≤n} RS_j) where " +
      "RS is the plain prefix sum of the drifts — so two stock " +
      "windows (running sum + running min) over the tiny hour×type " +
      "aggregate replace the sequential scan, and the whole detector " +
      "parallelizes like any windowed query (identity replayed " +
      "driver-side in Round13ShapesSpec). Everything is exact BIGINT " +
      "in units scaled by 4n (drift D_i = 4n·x_i − 5T makes μ + μ/4 " +
      "integral); the only double is the final normalization of the " +
      "peak statistic back to original units.",
    Some("""WITH h AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |             count(*) AS cnt FROM events GROUP BY 1, 2),
           |tot AS (SELECT event_type, count(*) AS n, sum(cnt) AS t FROM h GROUP BY 1),
           |d AS (SELECT h.event_type, h.hr, 4*tot.n*h.cnt - 5*tot.t AS dd,
           |             tot.n AS n, tot.t AS t
           |      FROM h JOIN tot USING (event_type)),
           |rs AS (SELECT event_type, hr, n, t,
           |         sum(dd) OVER (PARTITION BY event_type ORDER BY hr
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rsum
           |       FROM d),
           |s AS (SELECT event_type, hr, n, t,
           |        rsum - least(0, min(rsum) OVER (PARTITION BY event_type ORDER BY hr
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS stat
           |      FROM rs)
           |SELECT event_type, CAST(max(n) AS BIGINT) AS n_hours,
           |       CAST(count(*) FILTER (WHERE stat > 8*t) AS BIGINT) AS n_alarms,
           |       CAST(min(hr) FILTER (WHERE stat > 8*t) AS BIGINT) AS first_alarm_hr,
           |       round(CAST(max(stat) AS DOUBLE) / CAST(4*max(n) AS DOUBLE), 6) AS max_stat
           |FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val hourExpr =
        "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val h = events(s, d)
        .groupBy(col("event_type"), expr(hourExpr).as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val tot = h.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("cnt").as("t"))
      val dd = h.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("hr"), col("n"), col("t"),
          (lit(4L) * col("n") * col("cnt") - lit(5L) * col("t")).as("dd"))
      val wc = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val st = dd
        .withColumn("rsum", sum(col("dd")).over(wc))
        .withColumn("stat",
          col("rsum") - least(lit(0L), min(col("rsum")).over(wc)))
      val alarm = col("stat") > lit(8L) * col("t")
      st.groupBy("event_type").agg(
          lng(max(col("n"))).as("n_hours"),
          lng(count(when(alarm, lit(1)))).as("n_alarms"),
          lng(min(when(alarm, col("hr")))).as("first_alarm_hr"),
          round(dbl(max(col("stat"))) / dbl(lit(4L) * max(col("n"))), 6)
            .as("max_stat"))
        .orderBy("event_type")
    }
  )

  // -------------------------------------------------------------- theil_sen

  private val theilSen = QueryDef(
    "q_theil_sen",
    "Theil-Sen robust trend per event type: the median (and quartile " +
      "band) of all pairwise slopes (cnt_j − cnt_i)/(hr_j − hr_i) of " +
      "hourly counts — the outlier-immune complement to q_regression's " +
      "least-squares fit (one corrupted hour moves OLS arbitrarily, " +
      "but not an order statistic of C(n,2) slopes). SCALE SHAPE: the " +
      "pair enumeration self-joins the hour×type AGGREGATE, never the " +
      "fact — its size is C(hours, 2) per type, a function of the time " +
      "span, not the corpus (100× more rows land in the same hours). " +
      "Each slope is ONE correctly-rounded IEEE division of two exact " +
      "BIGINTs (bit-identical across engines), and the median is a " +
      "LOWER order statistic selected by row_number under the total " +
      "order (slope, hr_i, hr_j) — no interpolation, no float " +
      "summation, so ties and equal slopes cannot flap between " +
      "engines. Quartiles price the slope uncertainty band (the " +
      "Sen-estimator confidence readout).",
    Some("""WITH h AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |             count(*) AS cnt FROM events GROUP BY 1, 2),
           |p AS (SELECT a.event_type,
           |        CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.hr - a.hr AS DOUBLE) AS slope,
           |        a.hr AS hi, b.hr AS hj
           |      FROM h a JOIN h b ON a.event_type = b.event_type AND a.hr < b.hr),
           |r AS (SELECT event_type, slope,
           |        row_number() OVER (PARTITION BY event_type
           |                           ORDER BY slope, hi, hj) AS rn,
           |        count(*) OVER (PARTITION BY event_type) AS np
           |      FROM p)
           |SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
           |       round(max(CASE WHEN rn = (np + 3) // 4 THEN slope END), 6) AS slope_q25,
           |       round(max(CASE WHEN rn = (np + 1) // 2 THEN slope END), 6) AS slope_med,
           |       round(max(CASE WHEN rn = (3 * np + 1) // 4 THEN slope END), 6) AS slope_q75
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val hourExpr =
        "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val h = events(s, d)
        .groupBy(col("event_type"), expr(hourExpr).as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .persist() // self-joined; one upstream fact scan, not two
      val a = h.select(col("event_type"), col("hr").as("hi"), col("cnt").as("ci"))
      val b = h.select(col("event_type").as("et2"), col("hr").as("hj"),
        col("cnt").as("cj"))
      val p = a.join(b, col("event_type") === col("et2") && col("hi") < col("hj"))
        .select(col("event_type"),
          (dbl(col("cj") - col("ci")) / dbl(col("hj") - col("hi"))).as("slope"),
          col("hi"), col("hj"))
      val w = Window.partitionBy("event_type").orderBy("slope", "hi", "hj")
      val r = p.withColumn("rn", row_number().over(w))
        .withColumn("np", count(lit(1)).over(Window.partitionBy("event_type")))
      val out = r.groupBy("event_type").agg(
          lng(max(col("np"))).as("n_pairs"),
          // DIV, not `/`: Spark's `/` on integers is DOUBLE division,
          // and rn == a fractional double would silently select nothing
          round(max(when(col("rn") === expr("(np + 3) DIV 4"), col("slope"))), 6)
            .as("slope_q25"),
          round(max(when(col("rn") === expr("(np + 1) DIV 2"), col("slope"))), 6)
            .as("slope_med"),
          round(max(when(col("rn") === expr("(3 * np + 1) DIV 4"), col("slope"))), 6)
            .as("slope_q75"))
        .orderBy("event_type")
      materializeThenRelease(out, h)
    }
  )

  // ------------------------------------------------------------ mann_kendall

  private val mannKendall = QueryDef(
    "q_mann_kendall",
    "Mann-Kendall trend test per event type — the nonparametric IS-" +
      "THERE-a-trend significance readout that pairs with q_theil_sen's " +
      "HOW-MUCH slope (the standard tandem for monotonic trend " +
      "detection): S = Σ_{i<j} sign(cnt_j − cnt_i) over hourly counts, " +
      "tie-corrected variance n(n−1)(2n+5) − Σ t(t−1)(2t+5) all in " +
      "exact BIGINT, continuity-corrected z = (S ∓ 1)/√(Var) as ONE " +
      "shared double chain (zero exactly when S = 0 — an integer " +
      "test). Same scale shape as q_theil_sen: the sign pairs " +
      "enumerate C(hours, 2) rows of the hour×type AGGREGATE — a " +
      "function of the time span, not the corpus — and the tie table " +
      "is a value-level count of counts. The fact is touched once.",
    Some("""WITH h AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |             count(*) AS cnt FROM events GROUP BY 1, 2),
           |p AS (SELECT a.event_type,
           |        CASE WHEN b.cnt > a.cnt THEN 1 WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
           |      FROM h a JOIN h b ON a.event_type = b.event_type AND a.hr < b.hr),
           |sg AS (SELECT event_type, sum(sgn) AS s FROM p GROUP BY 1),
           |tz AS (SELECT event_type, sum(t*(t-1)*(2*t+5)) AS tcorr FROM (
           |         SELECT event_type, cnt, count(*) AS t FROM h GROUP BY 1, 2)
           |       GROUP BY 1),
           |nn AS (SELECT event_type, count(*) AS n FROM h GROUP BY 1)
           |SELECT nn.event_type, CAST(nn.n AS BIGINT) AS n_hours,
           |       CAST(sg.s AS BIGINT) AS s,
           |       CASE WHEN sg.s = 0 THEN 0e0
           |            ELSE round((CAST(sg.s AS DOUBLE)
           |                        - CASE WHEN sg.s > 0 THEN 1e0 ELSE -1e0 END)
           |                 / sqrt(CAST(nn.n*(nn.n-1)*(2*nn.n+5) - tz.tcorr AS DOUBLE)
           |                        / 18e0), 6)
           |       END AS z
           |FROM nn JOIN sg USING (event_type) JOIN tz USING (event_type)
           |ORDER BY event_type""".stripMargin),
    (s, d) => {
      val hourExpr =
        "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val h = events(s, d)
        .groupBy(col("event_type"), expr(hourExpr).as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .persist() // three consumers: pairs (twice) + ties + n
      val a = h.select(col("event_type"), col("hr").as("hi"), col("cnt").as("ci"))
      val b = h.select(col("event_type").as("et2"), col("hr").as("hj"),
        col("cnt").as("cj"))
      val sg = a.join(b, col("event_type") === col("et2") && col("hi") < col("hj"))
        .select(col("event_type"),
          when(col("cj") > col("ci"), 1L)
            .when(col("cj") < col("ci"), -1L).otherwise(0L).as("sgn"))
        .groupBy("event_type").agg(sum(col("sgn")).as("s"))
      val tz = h.groupBy(col("event_type"), col("cnt"))
        .agg(count(lit(1)).as("t"))
        .groupBy("event_type")
        .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tcorr"))
      val nn = h.groupBy("event_type").agg(count(lit(1)).as("n"))
      val varNum = col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tcorr")
      val z = (dbl(col("s")) - when(col("s") > 0, lit(1.0)).otherwise(lit(-1.0))) /
        sqrt(dbl(varNum) / lit(18.0))
      val out = nn.join(sg, "event_type").join(tz, "event_type")
        .select(col("event_type"), lng(col("n")).as("n_hours"),
          lng(col("s")).as("s"),
          when(col("s") === 0, lit(0.0)).otherwise(round(z, 6)).as("z"))
        .orderBy("event_type")
      materializeThenRelease(out, h)
    }
  )

  // --------------------------------------------------------- hodges_lehmann

  private val hodgesLehmann = QueryDef(
    "q_hodges_lehmann",
    "Hodges-Lehmann effect-size estimator per treatment type: the " +
      "median (and quartile band) of ALL pairwise differences between " +
      "treatment and control hourly rates — the robust HOW-MUCH " +
      "companion to q_mann_whitney's IS-there significance, exactly " +
      "as q_theil_sen pairs with q_mann_kendall (the estimator the " +
      "rank test inverts to). Differences of hourly counts are exact " +
      "BIGINTs and the estimator is a LOWER order statistic under the " +
      "total order (diff, hr_t, hr_v) — the entire operator is " +
      "integer end-to-end, no doubles anywhere. Same scale shape as " +
      "the other pair queries: the cross of treatment hours × control " +
      "hours runs on the hour×type AGGREGATE — C(hours)² is a " +
      "function of the time span, not the corpus.",
    Some("""WITH h AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |             count(*) AS cnt FROM events GROUP BY 1, 2),
           |p AS (SELECT a.event_type, a.cnt - b.cnt AS diff, a.hr AS ht, b.hr AS hv
           |      FROM h a JOIN h b ON b.event_type = 'view' AND a.event_type <> 'view'),
           |r AS (SELECT event_type, diff,
           |        row_number() OVER (PARTITION BY event_type ORDER BY diff, ht, hv) AS rn,
           |        count(*) OVER (PARTITION BY event_type) AS np
           |      FROM p)
           |SELECT event_type AS treatment, CAST(max(np) AS BIGINT) AS n_pairs,
           |       CAST(max(CASE WHEN rn = (np + 3) // 4 THEN diff END) AS BIGINT) AS diff_q25,
           |       CAST(max(CASE WHEN rn = (np + 1) // 2 THEN diff END) AS BIGINT) AS hl_diff,
           |       CAST(max(CASE WHEN rn = (3 * np + 1) // 4 THEN diff END) AS BIGINT) AS diff_q75
           |FROM r GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val hourExpr =
        "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val h = events(s, d)
        .groupBy(col("event_type"), expr(hourExpr).as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .persist() // both sides of the treatment × control pair join
      val t = h.filter(col("event_type") =!= "view")
        .select(col("event_type"), col("hr").as("ht"), col("cnt").as("ct"))
      val v = h.filter(col("event_type") === "view")
        .select(col("hr").as("hv"), col("cnt").as("cv"))
      // control side is hours-sized (bounded by the time span) — broadcast
      val p = t.join(broadcast(v))
        .select(col("event_type"), (col("ct") - col("cv")).as("diff"),
          col("ht"), col("hv"))
      val w = Window.partitionBy("event_type").orderBy("diff", "ht", "hv")
      val r = p.withColumn("rn", row_number().over(w))
        .withColumn("np", count(lit(1)).over(Window.partitionBy("event_type")))
      val out = r.groupBy(col("event_type").as("treatment")).agg(
          lng(max(col("np"))).as("n_pairs"),
          lng(max(when(col("rn") === expr("(np + 3) DIV 4"), col("diff"))))
            .as("diff_q25"),
          lng(max(when(col("rn") === expr("(np + 1) DIV 2"), col("diff"))))
            .as("hl_diff"),
          lng(max(when(col("rn") === expr("(3 * np + 1) DIV 4"), col("diff"))))
            .as("diff_q75"))
        .orderBy("treatment")
      materializeThenRelease(out, h)
    }
  )

  val defs: Seq[QueryDef] =
    Seq(profile, chisq, autocorr, winsorize, skyline, madOutliers, crossCorr,
      rankCorr, mannWhitney, cusum, theilSen, mannKendall, hodgesLehmann)
}
