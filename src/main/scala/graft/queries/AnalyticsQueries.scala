package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** SQL-analytics surface beyond the core relational inventory: pivot,
  * exact quantiles, exact moment statistics, and a raw-SQL entry point
  * exercising `spark.sql` + Catalyst subquery decorrelation
  * (SURVEY.md §4.2 `RewritePredicateSubquery` row).
  */
object AnalyticsQueries {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  private val pivot = QueryDef(
    "q_pivot",
    "Pivot: per user-cohort event counts, one column per event type. " +
      "Explicit value list keeps the schema static (a dynamic pivot " +
      "would need a driver-side distinct pass — at scale the value " +
      "list is always declared).",
    Some("""SELECT user_id % 10 AS cohort,
           |  CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
           |  CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
           |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
           |  CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
           |  CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
           |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin),
    (s, d) => events(s, d)
      .withColumn("cohort", col("user_id") % 10)
      .groupBy("cohort")
      .pivot("event_type", eventTypes)
      .agg(lng(count(lit(1))))
      .na.fill(0L, eventTypes)
      .orderBy("cohort")
  )

  private val quantiles = QueryDef(
    "q_quantiles",
    "Exact interpolated quantiles (median / p90) of value per event " +
      "type — Spark `percentile` and DuckDB `quantile_cont` share the " +
      "linear-interpolation definition, so results match bit-for-bit " +
      "under rounding. (approx_percentile is banned by the determinism " +
      "rules, SURVEY §7.5.)",
    Some("""SELECT event_type,
           |       round(quantile_cont(value, 0.5), 6) AS p50,
           |       round(quantile_cont(value, 0.9), 6) AS p90
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"))
      .orderBy("event_type")
  )

  private val moments = QueryDef(
    "q_moments",
    "Exact moment statistics: mean and population variance derived " +
      "from exact DECIMAL sums (Σx, Σx²) with a single double division " +
      "at the end — engine-identical, unlike native stddev/var whose " +
      "float summation order differs between engines.",
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean,
           |  round(CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           |        - (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
           |          * (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)), 6) AS var_pop
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => {
      val sx = dbl(sum(money(col("value"))))
      val sxx = dbl(sum(money(col("value")) * money(col("value"))))
      val n = count(lit(1))
      events(s, d)
        .groupBy("event_type")
        .agg(lng(n).as("n"),
          round(sx / n, 6).as("mean"),
          round(sxx / n - (sx / n) * (sx / n), 6).as("var_pop"))
        .orderBy("event_type")
    }
  )

  private val sqlExists = QueryDef(
    "q_sql_exists",
    "Raw-SQL entry point (spark.sql over registered temp views), " +
      "TPC-H Q4 shape: order-priority counts for orders with at least " +
      "one late lineitem. The correlated EXISTS decorrelates to a left " +
      "semi join (Catalyst RewritePredicateSubquery) — no per-row " +
      "subquery execution at any scale.",
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
           |FROM orders o
           |WHERE EXISTS (
           |  SELECT 1 FROM lineitem l
           |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    (s, d) => {
      orders(s, d).createOrReplaceTempView("orders")
      lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
          |FROM orders o
          |WHERE EXISTS (
          |  SELECT 1 FROM lineitem l
          |  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }
  )

  private val groupingSets = QueryDef(
    "q_grouping_sets",
    "GROUPING SETS via SQL (SURVEY §2.4): per-(type,cohort), per-type, " +
      "and grand-total aggregates in one pass — Catalyst expands to a " +
      "single Expand + hash aggregation, not three scans.",
    Some("""SELECT coalesce(event_type, '<all>') AS event_type,
           |       coalesce(CAST(user_id % 4 AS VARCHAR), '<all>') AS cohort,
           |       CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events
           |GROUP BY GROUPING SETS ((event_type, user_id % 4), (event_type), ())
           |ORDER BY event_type, cohort""".stripMargin),
    (s, d) => {
      events(s, d).createOrReplaceTempView("events")
      s.sql(
        """SELECT coalesce(event_type, '<all>') AS event_type,
          |       coalesce(CAST(user_id % 4 AS STRING), '<all>') AS cohort,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
          |FROM events
          |GROUP BY GROUPING SETS ((event_type, user_id % 4), (event_type), ())
          |ORDER BY event_type, cohort""".stripMargin)
    }
  )

  private val trainTestSplit = QueryDef(
    "q_split_train_test",
    "Deterministic hash-based train/valid/test split (80/10/10) — the " +
      "training-data-pipeline split must be a pure function of the row " +
      "key, not rand() or TABLESAMPLE: reproducible across engines, " +
      "runs, task retries, and repartitioning. Bucket = " +
      "(doc_id·2654435761) mod 100.",
    Some("""WITH b AS (
           |  SELECT doc_id, n_chars, (doc_id * 2654435761) % 100 AS bucket FROM documents),
           |s AS (
           |  SELECT CASE WHEN bucket < 80 THEN 'train'
           |              WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
           |         doc_id, n_chars
           |  FROM b)
           |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
           |FROM s GROUP BY split ORDER BY split""".stripMargin),
    (s, d) => documents(s, d)
      .withColumn("bucket", (col("doc_id") * 2654435761L) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid").otherwise("test"))
      .groupBy("split")
      .agg(lng(count(lit(1))).as("n_docs"),
        lng(sum(col("n_chars"))).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("split")
  )

  private val aggFiltered = QueryDef(
    "q_agg_filtered",
    "Conditional aggregation (FILTER clause semantics) in one pass: " +
      "per event_type, total count, count of high-value events, exact " +
      "decimal sum over even users only, and distinct high-value users " +
      "— Spark count/sum(when(...)) ≡ SQL FILTER (WHERE ...), no " +
      "self-joins, one aggregation.",
    Some("""SELECT event_type,
           |       CAST(count(*) AS BIGINT) AS n_total,
           |       CAST(count(*) FILTER (WHERE value > 10.0) AS BIGINT) AS n_hi,
           |       CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE user_id % 2 = 0), 0) AS DOUBLE) AS sum_even,
           |       CAST(count(DISTINCT user_id) FILTER (WHERE value > 10.0) AS BIGINT) AS hi_users
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("value") > 10.0, lit(1))).as("n_hi"),
        dbl(coalesce(sum(when(col("user_id") % 2 === 0, money(col("value")))), lit(0)))
          .as("sum_even"),
        lng(countDistinct(when(col("value") > 10.0, col("user_id")))).as("hi_users"))
      .orderBy("event_type")
  )

  private val corrStats = QueryDef(
    "q_corr",
    "Bivariate statistics per group from EXACT decimal co-moment sums " +
      "(n, \u03a3x, \u03a3y, \u03a3xy, \u03a3x\u00b2, \u03a3y\u00b2) with the double-precision " +
      "formulas applied once at the end \u2014 native corr/covar/stddev are " +
      "banned here for the same reason q_moments bans them: their float " +
      "summation order differs between engines, and a 1e-9 drift can " +
      "flip the 6th rounded decimal. Exact sums make both engines " +
      "compute identical doubles.",
    Some("""WITH s AS (
           |  SELECT l_returnflag, count(*) AS n,
           |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
           |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
           |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
           |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
           |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag,
           |  round((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_qp,
           |  round((sxy - sx * sy / n) / (n - 1), 6) AS covs_qp,
           |  round(sxy / n - (sx / n) * (sy / n), 6) AS covp_qp,
           |  round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS sd_q,
           |  round(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS sd_p,
           |  CAST(n AS BIGINT) AS n
           |FROM s ORDER BY l_returnflag""".stripMargin),
    (s, d) => {
      val x = "CAST(l_quantity AS DECIMAL(12,2))"
      val y = "CAST(l_extendedprice AS DECIMAL(12,2))"
      val g = lineitem(s, d).groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        dbl(sum(expr(x))).as("sx"),
        dbl(sum(expr(y))).as("sy"),
        dbl(sum(expr(s"$x * $y"))).as("sxy"),
        dbl(sum(expr(s"$x * $x"))).as("sxx"),
        dbl(sum(expr(s"$y * $y"))).as("syy"))
      // double-precision formulas written identically to the oracle SQL
      // so both engines evaluate the same operations on the same doubles
      g.select(col("l_returnflag"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qp"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 6).as("covs_qp"),
        round(col("sxy") / col("n") - (col("sx") / col("n")) * (col("sy") / col("n")), 6).as("covp_qp"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6).as("sd_q"),
        round(sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)), 6).as("sd_p"),
        lng(col("n")).as("n"))
        .orderBy("l_returnflag")
    }
  )

  private val histogram = QueryDef(
    "q_histogram",
    "Value histogram per event type: fixed-width binning via integer " +
      "arithmetic (floor(value/width) capped to the last bucket — " +
      "portable across engines, unlike width_bucket which DuckDB " +
      "lacks), plus per-bin exact decimal sums. The one-pass shape of " +
      "every monitoring/profiling dashboard.",
    Some("""SELECT event_type,
           |       CAST(least(CAST(floor(value / 25.0) AS BIGINT), 19) AS BIGINT) AS bin,
           |       CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events
           |GROUP BY event_type, least(CAST(floor(value / 25.0) AS BIGINT), 19)
           |ORDER BY event_type, bin""".stripMargin),
    (s, d) => events(s, d)
      .withColumn("bin", least(floor(col("value") / 25.0).cast("long"), lit(19L)))
      .groupBy("event_type", "bin")
      .agg(lng(count(lit(1))).as("n"),
        dbl(sum(money(col("value")))).as("sum_value"))
      .orderBy("event_type", "bin")
  )

  private val gapFill = QueryDef(
    "q_gap_fill",
    "Time-series gap-fill: hourly event counts per type INCLUDING empty " +
      "hours — generate the full hour×type grid (sequence + explode + " +
      "broadcast cross of the tiny distinct-type side), left-join the " +
      "observed counts, coalesce to zero. Hours are integer epoch-hour " +
      "buckets so both engines bin identically. The dashboard/resample " +
      "primitive every monitoring pipeline needs.",
    Some("""WITH e AS (SELECT event_type,
           |                  epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h FROM events),
           |b AS (SELECT min(h) AS hmin, max(h) AS hmax FROM e),
           |hours AS (SELECT unnest(generate_series(hmin, hmax)) AS h FROM b),
           |types AS (SELECT DISTINCT event_type FROM e),
           |grid AS (SELECT h, event_type FROM hours CROSS JOIN types),
           |c AS (SELECT h, event_type, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2)
           |SELECT g.event_type, g.h, coalesce(c.n, 0) AS n
           |FROM grid g LEFT JOIN c ON g.h = c.h AND g.event_type = c.event_type
           |ORDER BY g.event_type, g.h""".stripMargin),
    (s, d) => {
      // FLOOR division to match DuckDB's `//` on negative epochs too
      // (Spark's DIV truncates toward zero: -1 DIV k = 0, -1 // k = -1);
      // subtracting pmod first makes the dividend an exact multiple
      val hExpr = "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      // persist: the projection feeds three subtrees (bounds, distinct
      // types, grouped counts) — one scan instead of three
      val e = events(s, d)
        .select(col("event_type"), expr(hExpr).as("h")).persist()
      val hours = e.agg(min("h").as("hmin"), max("h").as("hmax"))
        .select(explode(sequence(col("hmin"), col("hmax"))).as("h"))
      val types = e.select("event_type").distinct()
      val grid = hours.crossJoin(broadcast(types))
      val counts = e.groupBy("h", "event_type").agg(lng(count(lit(1))).as("n"))
      grid.join(counts, Seq("h", "event_type"), "left")
        .select(col("event_type"), col("h"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("event_type", "h")
    }
  )

  private val funnel = QueryDef(
    "q_funnel",
    "Conversion funnel: per user, first click vs first purchase; " +
      "converted = first purchase within 1 h after first click. One " +
      "conditional-min aggregation by user + one tiny rollup — no " +
      "self-join, no per-user subqueries, the linear-scaling funnel " +
      "shape.",
    Some("""WITH e AS (SELECT user_id, event_type,
           |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
           |f AS (SELECT user_id,
           |             min(CASE WHEN event_type = 'click' THEN us END) AS first_click,
           |             min(CASE WHEN event_type = 'purchase' THEN us END) AS first_purchase
           |      FROM e GROUP BY user_id)
           |SELECT CAST(count(*) AS BIGINT) AS n_users,
           |       CAST(count(CASE WHEN first_click IS NOT NULL THEN 1 END) AS BIGINT) AS n_clickers,
           |       CAST(count(CASE WHEN first_purchase IS NOT NULL THEN 1 END) AS BIGINT) AS n_purchasers,
           |       CAST(count(CASE WHEN first_purchase IS NOT NULL AND first_click IS NOT NULL
           |                        AND first_purchase >= first_click
           |                        AND first_purchase <= first_click + 3600000000
           |                  THEN 1 END) AS BIGINT) AS n_converted_1h
           |FROM f""".stripMargin),
    (s, d) => events(s, d)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "click", col("us"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("us"))).as("first_purchase"))
      .agg(
        lng(count(lit(1))).as("n_users"),
        lng(count(when(col("first_click").isNotNull, 1))).as("n_clickers"),
        lng(count(when(col("first_purchase").isNotNull, 1))).as("n_purchasers"),
        lng(count(when(col("first_purchase").isNotNull && col("first_click").isNotNull &&
          col("first_purchase") >= col("first_click") &&
          col("first_purchase") <= col("first_click") + 3600000000L, 1))).as("n_converted_1h"))
  )

  // -------------------------------------------------------------- itemsets

  private val itemsets = QueryDef(
    "q_itemsets",
    "Frequent-itemset mining, pair tier (the Apriori/market-basket " +
      "workhorse): the top-100 co-purchased part pairs by support " +
      "(number of orders containing both), with rational lift — " +
      "support·N / (n1·n2), one IEEE division of exact BIGINTs — " +
      "telling real affinity from popularity. Pair generation is " +
      "ORDER-LOCAL: each order's distinct part set collects in ONE " +
      "map-side-combined shuffle and the C(k,2) pairs generate " +
      "in-task from the bounded array (no fact self-join, no second " +
      "exchange), per-part order counts join the pair table twice " +
      "key-partitioned, scalars broadcast, and the top-100 with " +
      "total-order tiebreak compiles to TakeOrderedAndProject — no " +
      "global sort at any corpus size.",
    Some("""WITH pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           |              count(DISTINCT a.l_orderkey) AS support
           |            FROM lineitem a JOIN lineitem b
           |              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |            GROUP BY 1, 2),
           |po AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS n FROM lineitem GROUP BY 1),
           |no AS (SELECT count(DISTINCT o_orderkey) AS n FROM orders)
           |SELECT pr.p1, pr.p2, CAST(pr.support AS BIGINT) AS support,
           |       round(CAST(pr.support * no.n AS DOUBLE) / (po1.n * po2.n), 6) AS lift
           |FROM pr JOIN po po1 ON pr.p1 = po1.l_partkey
           |        JOIN po po2 ON pr.p2 = po2.l_partkey
           |        CROSS JOIN no
           |ORDER BY support DESC, p1, p2 LIMIT 100""".stripMargin),
    (s, d) => {
      // collect each order's distinct sorted part set ONCE, generate the
      // C(k,2) pairs IN-TASK — no fact self-join (q_item_recs shape)
      val baskets = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .persist()
      val pairExpr = expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |            y -> struct(x AS p1, y AS p2))))""".stripMargin)
      val pr = baskets.select(explode(pairExpr).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(count(lit(1)).as("support"))
      val po = baskets.select(explode(col("ps")).as("l_partkey"))
        .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      val no = orders(s, d).agg(countDistinct(col("o_orderkey")).as("no"))
      pr.join(po.select(col("l_partkey").as("p1"), col("n").as("n1")), "p1")
        .join(po.select(col("l_partkey").as("p2"), col("n").as("n2")), "p2")
        .crossJoin(broadcast(no))
        .select(col("p1"), col("p2"), lng(col("support")).as("support"),
          round(dbl(col("support") * col("no")) / (col("n1") * col("n2")), 6)
            .as("lift"))
        .orderBy(col("support").desc, col("p1"), col("p2"))
        .limit(100)
    }
  )

  // ------------------------------------------------------------------ gini

  private val gini = QueryDef(
    "q_gini",
    "Gini coefficient of revenue concentration across suppliers, per " +
      "nation — the inequality audit a data-mix curator runs before " +
      "rebalancing sources. Per-supplier revenue is an exact DECIMAL " +
      "sum; within each nation suppliers are ranked by (revenue, " +
      "suppkey) — row_number on a PARTITIONED window over the " +
      "supplier-level aggregate, never the fact table — and Gini = " +
      "(2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) is assembled from exact " +
      "rank-weighted DECIMAL sums with ONE final IEEE division. Tie " +
      "order cannot move the statistic (equal xᵢ contribute the same " +
      "Σi·xᵢ under any permutation), so row_number is safe.",
    Some("""WITH rev AS (SELECT s.s_nationkey AS nationkey, s.s_suppkey,
           |               sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
           |                   (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS rev
           |             FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |             GROUP BY 1, 2),
           |rk AS (SELECT nationkey, rev,
           |         row_number() OVER (PARTITION BY nationkey ORDER BY rev, s_suppkey) AS i
           |       FROM rev)
           |SELECT nationkey,
           |       CAST(count(*) AS BIGINT) AS n_suppliers,
           |       CAST(sum(rev) AS DOUBLE) AS total_rev,
           |       round(CAST(2 * sum(i * rev) - (count(*) + 1) * sum(rev) AS DOUBLE) /
           |             CAST(count(*) * sum(rev) AS DOUBLE), 6) AS gini
           |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val revExpr = "CAST(l_extendedprice AS DECIMAL(12,2)) * " +
        "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
      val rev = lineitem(s, d).select(col("l_suppkey"), expr(revExpr).as("r"))
        .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nationkey"), col("s_suppkey"))
        .agg(sum(col("r")).as("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("nationkey").orderBy("rev", "s_suppkey")
      rev.withColumn("i", row_number().over(w))
        .groupBy("nationkey")
        .agg(lng(count(lit(1))).as("n_suppliers"),
          dbl(sum(col("rev"))).as("total_rev"),
          sum(col("i") * col("rev")).as("siw"),
          sum(col("rev")).as("sx"),
          count(lit(1)).as("n"))
        .select(col("nationkey"), col("n_suppliers"), col("total_rev"),
          round(dbl(lit(2) * col("siw") - (col("n") + 1) * col("sx")) /
            dbl(col("n") * col("sx")), 6).as("gini"))
        .orderBy("nationkey")
    }
  )

  // ------------------------------------------------------------------- rfm

  private val rfm = QueryDef(
    "q_rfm",
    "RFM customer segmentation (recency / frequency / monetary): per " +
      "customer, days since last order relative to the corpus max " +
      "date (integer epoch-day subtraction), order count, and exact " +
      "DECIMAL spend; each dimension scored 1-4 against its exact " +
      "interpolated quartiles (percentile ⇔ quantile_cont, " +
      "q_quantiles precedent). The quartile thresholds come from ONE " +
      "global aggregation over the already-aggregated per-customer " +
      "table and are BROADCAST back — scoring is a threshold CASE " +
      "per row, NOT a global ntile window, so no single-partition " +
      "sort exists at any customer count.",
    Some("""WITH cust AS (SELECT o_custkey,
           |                (SELECT max(epoch_us(o_orderdate) // 86400000000) FROM orders)
           |                  - max(epoch_us(o_orderdate) // 86400000000) AS recency_days,
           |                count(*) AS frequency,
           |                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
           |              FROM orders GROUP BY 1),
           |th AS (SELECT quantile_cont(CAST(recency_days AS DOUBLE), 0.25) AS r25,
           |              quantile_cont(CAST(recency_days AS DOUBLE), 0.50) AS r50,
           |              quantile_cont(CAST(recency_days AS DOUBLE), 0.75) AS r75,
           |              quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f25,
           |              quantile_cont(CAST(frequency AS DOUBLE), 0.50) AS f50,
           |              quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f75,
           |              quantile_cont(monetary, 0.25) AS m25,
           |              quantile_cont(monetary, 0.50) AS m50,
           |              quantile_cont(monetary, 0.75) AS m75
           |       FROM cust)
           |SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           |       CAST(frequency AS BIGINT) AS frequency, monetary,
           |       CAST(CASE WHEN CAST(recency_days AS DOUBLE) <= r25 THEN 4
           |            WHEN CAST(recency_days AS DOUBLE) <= r50 THEN 3
           |            WHEN CAST(recency_days AS DOUBLE) <= r75 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
           |       CAST(CASE WHEN CAST(frequency AS DOUBLE) <= f25 THEN 1
           |            WHEN CAST(frequency AS DOUBLE) <= f50 THEN 2
           |            WHEN CAST(frequency AS DOUBLE) <= f75 THEN 3 ELSE 4 END AS BIGINT) AS f_score,
           |       CAST(CASE WHEN monetary <= m25 THEN 1
           |            WHEN monetary <= m50 THEN 2
           |            WHEN monetary <= m75 THEN 3 ELSE 4 END AS BIGINT) AS m_score
           |FROM cust CROSS JOIN th
           |ORDER BY o_custkey""".stripMargin),
    (s, d) => {
      // NTZ orderdate → µs via TIMESTAMP cast (UTC session; StatsQueries
      // precedent); modern dates are positive so DIV == floor == DuckDB //
      val day = "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"
      val o = orders(s, d)
      val maxDay = o.agg(max(expr(day)).as("max_day"))
      val cust = o.crossJoin(broadcast(maxDay))
        .groupBy("o_custkey")
        .agg((first(col("max_day")) - max(expr(day))).as("recency_days"),
          count(lit(1)).as("frequency"),
          dbl(sum(money(col("o_totalprice")))).as("monetary"))
        .persist()
      val th = cust.agg(
        expr("percentile(CAST(recency_days AS DOUBLE), 0.25)").as("r25"),
        expr("percentile(CAST(recency_days AS DOUBLE), 0.50)").as("r50"),
        expr("percentile(CAST(recency_days AS DOUBLE), 0.75)").as("r75"),
        expr("percentile(CAST(frequency AS DOUBLE), 0.25)").as("f25"),
        expr("percentile(CAST(frequency AS DOUBLE), 0.50)").as("f50"),
        expr("percentile(CAST(frequency AS DOUBLE), 0.75)").as("f75"),
        expr("percentile(monetary, 0.25)").as("m25"),
        expr("percentile(monetary, 0.50)").as("m50"),
        expr("percentile(monetary, 0.75)").as("m75"))
      def band(v: org.apache.spark.sql.Column, lo: String, mid: String,
          hi: String, asc: Boolean) = {
        val (a, b2, c3, d4) = if (asc) (1, 2, 3, 4) else (4, 3, 2, 1)
        lng(when(v <= col(lo), a).when(v <= col(mid), b2)
          .when(v <= col(hi), c3).otherwise(d4))
      }
      cust.crossJoin(broadcast(th))
        .select(col("o_custkey"), lng(col("recency_days")).as("recency_days"),
          lng(col("frequency")).as("frequency"), col("monetary"),
          band(dbl(col("recency_days")), "r25", "r50", "r75", asc = false).as("r_score"),
          band(dbl(col("frequency")), "f25", "f50", "f75", asc = true).as("f_score"),
          band(col("monetary"), "m25", "m50", "m75", asc = true).as("m_score"))
        .orderBy("o_custkey")
    }
  )

  val defs: Seq[QueryDef] = Seq(pivot, quantiles, moments, sqlExists, gini, rfm,
    groupingSets, trainTestSplit, aggFiltered, corrStats, histogram,
    gapFill, funnel, itemsets)
}
