package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.ops.Skew
import graft.util.Det._

/** Warehouse-maintenance and dataset-composition operators: SCD2
  * (slowly-changing-dimension) merge, deterministic source-weighted
  * data mixing, the salt-replicated skew join, and equi-depth quantile
  * binning — the table-maintenance half of a production pipeline that
  * the purely analytical inventory doesn't exercise.
  *
  * Scale shapes (PLANS.md r4): scd2 is two co-partitioned custkey
  * joins + a union (one logical pass over the dim); data_mix is a
  * scan-stage filter (pure function of the key — no sampling pass, no
  * shuffle); join_salted bounds every join task at hot-key-volume /
  * buckets; quantile_bucket broadcasts a ≤5-row cutpoint table.
  */
object WarehouseQueries {

  private val scd2 = QueryDef(
    "q_scd2_merge",
    "SCD2 (type-2 slowly-changing-dimension) merge: an update batch — " +
      "customers with an odd order count get acctbal +100 — lands on " +
      "the dim as history rows: updated keys carry a closed version 1 " +
      "and a current version 2, untouched keys stay at version 1. The " +
      "CDC upsert-with-history primitive (MERGE INTO ... WHEN MATCHED) " +
      "expressed as two co-partitioned joins + a union; +100.0 is one " +
      "IEEE double addition, engine-exact.",
    Some("""WITH upd AS (SELECT o_custkey AS k FROM orders
           |             GROUP BY 1 HAVING count(*) % 2 = 1)
           |SELECT c.c_custkey, 1 AS version, c.c_mktsegment,
           |       c.c_acctbal AS acctbal,
           |       (u.k IS NULL) AS is_current
           |FROM customer c LEFT JOIN upd u ON c.c_custkey = u.k
           |UNION ALL
           |SELECT c.c_custkey, 2 AS version, c.c_mktsegment,
           |       c.c_acctbal + 100.0 AS acctbal, true AS is_current
           |FROM customer c JOIN upd u ON c.c_custkey = u.k
           |ORDER BY c_custkey, version""".stripMargin),
    (s, d) => {
      val upd = orders(s, d).groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("n")).filter(col("n") % 2 === 1).select("k")
      val c = customer(s, d)
      val v1 = c.join(upd, col("c_custkey") === col("k"), "left")
        .select(col("c_custkey"), lit(1).as("version"), col("c_mktsegment"),
          col("c_acctbal").as("acctbal"), col("k").isNull.as("is_current"))
      val v2 = c.join(upd, col("c_custkey") === col("k"))
        .select(col("c_custkey"), lit(2).as("version"), col("c_mktsegment"),
          (col("c_acctbal") + 100.0).as("acctbal"), lit(true).as("is_current"))
      v1.unionAll(v2).orderBy("c_custkey", "version")
    }
  )

  private val dataMix = QueryDef(
    "q_data_mix",
    "Deterministic source-weighted data mixing: each source srcN keeps " +
      "a per-source fraction ((N mod 10)·10 + 5)% of its docs, selected " +
      "by the same multiplicative-hash bucket as q_split_train_test — " +
      "a pure function of (doc_id, source), so the mix is reproducible " +
      "across runs, retries and engines, needs no sampling pass, and " +
      "composes with any upstream filter. The corpus-composition step " +
      "every multi-source training run starts with; the filter runs " +
      "inside the scan stage, zero extra shuffles.",
    Some("""SELECT source, doc_id
           |FROM (SELECT source, doc_id,
           |        (CAST(substr(source, 4) AS INT) % 10) * 10 + 5 AS keep_pct,
           |        (doc_id * 2654435761) % 100 AS bucket
           |      FROM documents)
           |WHERE bucket < keep_pct
           |ORDER BY source, doc_id""".stripMargin),
    (s, d) => documents(s, d)
      .select(col("source"), col("doc_id"),
        ((substring(col("source"), 4, 10).cast("int") % 10) * 10 + 5).as("keep_pct"),
        ((col("doc_id") * 2654435761L) % 100).as("bucket"))
      .filter(col("bucket") < col("keep_pct"))
      .select("source", "doc_id")
      .orderBy("source", "doc_id")
  )

  private val joinSalted = QueryDef(
    "q_join_salted",
    "Salt-replicated skew join (graft.ops.Skew.saltedEquiJoin): " +
      "lineitem joins supplier on (suppkey, salt∈[0,8)) with the " +
      "supplier side replicated ×8 — one hot supplier key spreads over " +
      "8 join tasks instead of funneling through one. Row-identical to " +
      "the plain equi-join the oracle runs (proven by the hash " +
      "compare); shuffle_hash-hinted because a broadcastable small " +
      "side wouldn't need salting. Revenue per supplier nation.",
    Some("""SELECT s.s_nationkey,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
           |                * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           |       CAST(count(*) AS BIGINT) AS n_items
           |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |GROUP BY s.s_nationkey ORDER BY s.s_nationkey""".stripMargin),
    (s, d) => {
      val joined = Skew.saltedEquiJoin(
        lineitem(s, d), "l_suppkey", supplier(s, d), "s_suppkey",
        saltSource = col("l_orderkey") * 31 + col("l_linenumber"), buckets = 8)
      joined.groupBy("s_nationkey")
        .agg(dbl(sum(expr(
          "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))")))
          .as("revenue"),
          lng(count(lit(1))).as("n_items"))
        .orderBy("s_nationkey")
    }
  )

  private val quantileBucket = QueryDef(
    "q_quantile_bucket",
    "Equi-depth (quantile) binning: per-type p25/p50/p75 cutpoints " +
      "(exact interpolated percentiles, the q_quantiles parity " +
      "discipline, ROUNDED before comparison so both engines bucket on " +
      "identical doubles) broadcast back onto the events; per-(type, " +
      "bucket) counts and exact decimal sums. The feature-binning " +
      "primitive — unlike q_histogram's fixed width, bin edges adapt " +
      "to the distribution. No global sort, no ntile: a ≤5-row " +
      "cutpoint aggregate + a map-side CASE.",
    Some("""WITH c AS (SELECT event_type,
           |    round(quantile_cont(value, 0.25), 6) AS c1,
           |    round(quantile_cont(value, 0.50), 6) AS c2,
           |    round(quantile_cont(value, 0.75), 6) AS c3
           |  FROM events GROUP BY event_type)
           |SELECT e.event_type,
           |  CASE WHEN e.value < c.c1 THEN 0 WHEN e.value < c.c2 THEN 1
           |       WHEN e.value < c.c3 THEN 2 ELSE 3 END AS bucket,
           |  CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events e JOIN c ON e.event_type = c.event_type
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val cuts = events(s, d).groupBy("event_type").agg(
        round(expr("percentile(value, 0.25)"), 6).as("c1"),
        round(expr("percentile(value, 0.50)"), 6).as("c2"),
        round(expr("percentile(value, 0.75)"), 6).as("c3"))
      events(s, d).join(broadcast(cuts), "event_type")
        .withColumn("bucket",
          when(col("value") < col("c1"), 0)
            .when(col("value") < col("c2"), 1)
            .when(col("value") < col("c3"), 2).otherwise(3))
        .groupBy("event_type", "bucket")
        .agg(lng(count(lit(1))).as("n"),
          dbl(sum(money(col("value")))).as("sum_value"))
        .orderBy("event_type", "bucket")
    }
  )

  private val unpivot = QueryDef(
    "q_unpivot",
    "Unpivot / melt (wide → long): each lineitem row's (quantity, " +
      "discount, tax) becomes three (metric, val) rows — Spark's " +
      "stack() generator, a scan-stage row expansion with zero " +
      "shuffles before the oracle sort; the oracle expresses the same " +
      "reshape as a 3-way UNION ALL. Values pass through untouched " +
      "(no arithmetic, no float hazard). The long-format step feature " +
      "stores and plotting/ML libraries expect.",
    Some("""SELECT l_orderkey, l_linenumber, metric, val FROM (
           |  SELECT l_orderkey, l_linenumber, 'discount' AS metric, l_discount AS val
           |  FROM lineitem WHERE l_orderkey < 2000
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'quantity', l_quantity
           |  FROM lineitem WHERE l_orderkey < 2000
           |  UNION ALL
           |  SELECT l_orderkey, l_linenumber, 'tax', l_tax
           |  FROM lineitem WHERE l_orderkey < 2000)
           |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin),
    (s, d) => lineitem(s, d)
      .filter(col("l_orderkey") < 2000)
      .selectExpr("l_orderkey", "l_linenumber",
        "stack(3, 'discount', l_discount, 'quantity', l_quantity, 'tax', l_tax) AS (metric, val)")
      .orderBy("l_orderkey", "l_linenumber", "metric")
  )

  private val kAnon = QueryDef(
    "q_k_anon",
    "k-anonymity audit (k=10) over the quasi-identifier pair " +
      "(nationkey, mktsegment): group sizes plus an at_risk flag for " +
      "groups smaller than k — the privacy pre-check a training corpus " +
      "runs before release, and the aggregate q_pii_redact's row-level " +
      "redaction complements. One combine-friendly count, integer-only.",
    Some("""SELECT c_nationkey, c_mktsegment,
           |       CAST(count(*) AS BIGINT) AS n,
           |       (count(*) < 10) AS at_risk
           |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => customer(s, d)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(lng(count(lit(1))).as("n"), (count(lit(1)) < 10).as("at_risk"))
      .orderBy("c_nationkey", "c_mktsegment")
  )

  /** l-diversity audit — the companion check to [[kAnon]]: k-anonymity
    * bounds group SIZE, but a group can be large and still leak if
    * every member shares the same sensitive value. Distinct-l and
    * entropy-l per quasi-identifier group are the two standard
    * readouts (Machanavajjhala et al. 2007).
    *
    * Determinism: counts are exact BIGINTs; the acctbal bucket
    * thresholds compare 2-decimal money values (no float ambiguity);
    * entropy follows the q_entropy discipline (per-cell −p·log2 p
    * rounded to 9 decimals, summed as exact DECIMAL, final round-6).
    *
    * Scale: one fact aggregation to ≤ QI×senses cells, then a tiny
    * rollup — the same two-level shape as q_entropy; nothing row-level
    * survives the first groupBy.
    */
  private val lDiversity = QueryDef(
    "q_l_diversity",
    "l-diversity audit over the (nationkey, acctbal-bucket) " +
      "quasi-identifier: group size, distinct-l (count of distinct " +
      "mktsegment values), entropy-l (Shannon entropy bits of the " +
      "sensitive distribution), and the at-risk flag for groups with " +
      "distinct-l < 3 — the release gate run after q_k_anon.",
    Some("""WITH cells AS (
           |  SELECT c_nationkey,
           |         CASE WHEN c_acctbal < 0 THEN 'neg'
           |              WHEN c_acctbal < 5000 THEN 'mid'
           |              ELSE 'high' END AS bal_bucket,
           |         c_mktsegment, count(*) AS c
           |  FROM customer GROUP BY 1, 2, 3),
           |tot AS (SELECT c_nationkey, bal_bucket, sum(c) AS n FROM cells GROUP BY 1, 2)
           |SELECT cells.c_nationkey, cells.bal_bucket,
           |       CAST(tot.n AS BIGINT) AS n,
           |       CAST(count(*) AS BIGINT) AS l_distinct,
           |       round(CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy_l,
           |       (count(*) < 3) AS at_risk
           |FROM cells JOIN tot USING (c_nationkey, bal_bucket)
           |GROUP BY cells.c_nationkey, cells.bal_bucket, tot.n
           |ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val bucket = when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "mid").otherwise("high")
      val cells = customer(s, d)
        .groupBy(col("c_nationkey"), bucket.as("bal_bucket"), col("c_mktsegment"))
        .agg(count(lit(1)).as("c"))
      val tot = cells.groupBy("c_nationkey", "bal_bucket").agg(sum("c").as("n"))
      val contrib = round(-(dbl(col("c")) / col("n")) *
          log2(dbl(col("c")) / col("n")), 9)
        .cast(org.apache.spark.sql.types.DecimalType(18, 9))
      cells.join(broadcast(tot), Seq("c_nationkey", "bal_bucket"))
        .groupBy(col("c_nationkey"), col("bal_bucket"), col("n"))
        .agg(lng(count(lit(1))).as("l_distinct"),
          round(dbl(sum(contrib)), 6).as("entropy_l"),
          (count(lit(1)) < 3).as("at_risk"))
        .select(col("c_nationkey"), col("bal_bucket"), lng(col("n")).as("n"),
          col("l_distinct"), col("entropy_l"), col("at_risk"))
        .orderBy("c_nationkey", "bal_bucket")
    }
  )

  private val sampleWeighted = QueryDef(
    "q_sample_weighted",
    "Deterministic WEIGHTED Bernoulli sample: inclusion probability " +
      "min(1, n_chars/1000) — longer documents proportionally more " +
      "likely — decided by the q_data_mix multiplicative-hash bucket, " +
      "a pure function of doc_id. Integer arithmetic only (no float " +
      "RNG, no transcendental A-ES keys), so the sample is identical " +
      "across runs, retries, partitionings and engines, and the filter " +
      "runs inside the scan stage with zero shuffles.",
    Some("""SELECT doc_id, source, n_chars
           |FROM documents
           |WHERE (doc_id * 2654435761) % 1000 < least(n_chars, 1000)
           |ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d)
      .filter((col("doc_id") * 2654435761L) % 1000 <
        least(col("n_chars"), lit(1000)))
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")
  )

  private val incrAgg = QueryDef(
    "q_incr_agg",
    "Incremental aggregate maintenance: the base slice (shipped " +
      "before 2001) and the delta slice (2001 onward) are partially " +
      "aggregated SEPARATELY, then the partials merge — count by " +
      "summing counts, sums by summing exact DECIMAL partials (exact " +
      "addition is associative, so partial+merge equals the direct " +
      "aggregate bit-for-bit; IEEE doubles would not be). The oracle " +
      "computes the direct one-pass aggregate, proving the " +
      "incremental path lossless. At 100 TB this is the pattern that " +
      "avoids reprocessing the full fact table per refresh: yesterday " +
      "is a stored partial, only the delta is scanned.",
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM lineitem
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val cutoff = lit("2001-01-01").cast("timestamp")
      def partial(df: org.apache.spark.sql.DataFrame) = df
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"),
          sum(money(col("l_quantity"))).as("p_qty"),
          sum(money(col("l_extendedprice"))).as("p_price"))
      val li = lineitem(s, d)
      val base = partial(li.filter(col("l_shipdate") < cutoff))
      val delta = partial(li.filter(col("l_shipdate") >= cutoff))
      base.unionByName(delta)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(lng(sum(col("cnt"))).as("n_rows"),
          dbl(sum(col("p_qty"))).as("sum_qty"),
          dbl(sum(col("p_price"))).as("sum_price"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  )

  private val cdcApply = QueryDef(
    "q_cdc_apply",
    "CDC changelog compaction: treat events as a change stream keyed " +
      "by user_id ('error' = delete, anything else = upsert carrying " +
      "the new state). The latest change wins — row_number over " +
      "(ts DESC, event_id DESC) with the event_id tiebreak making " +
      "same-microsecond changes deterministic — and a surviving " +
      "delete removes the key. The rn=1 filter compiles to a top-1 " +
      "per-key WindowGroupLimit (partial limit BEFORE the exchange), " +
      "so compacting a 100 TB changelog shuffles only per-key " +
      "candidates, and the single shuffle is on the natural merge key.",
    Some("""WITH r AS (SELECT user_id, ts, event_id, event_type, value,
           |             row_number() OVER (PARTITION BY user_id
           |               ORDER BY ts DESC, event_id DESC) AS rn
           |           FROM events)
           |SELECT user_id, epoch_us(ts) AS last_ts, event_type AS last_op,
           |       round(value, 6) AS state
           |FROM r WHERE rn = 1 AND event_type <> 'error'
           |ORDER BY user_id""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), epochUs(col("ts")).as("last_ts"),
          col("event_type").as("last_op"),
          round(col("value"), 6).as("state"))
        .orderBy("user_id")
    }
  )

  // ---------------------------------------------------------- join interval

  private val joinInterval = QueryDef(
    "q_join_interval",
    "Point-in-time (validity-interval) join — the SCD2 consumption " +
      "side: signup events become versioned per-user dimension rows " +
      "with [us, next_us) validity built by one lead() window; each " +
      "purchase joins the version valid at its timestamp. The join is " +
      "an EQUI join on user_id with the interval containment as a " +
      "residual predicate — per-user version counts are bounded, so " +
      "candidates per probe are bounded and nothing degenerates into " +
      "a range cross product (contrast q_join_asof, which solves the " +
      "no-dimension case with a union+last window). Intervals " +
      "partition time, so exactly one version matches per purchase — " +
      "deterministic without tiebreaks. Purchases before the first " +
      "signup drop (inner).",
    Some("""WITH e AS (SELECT user_id, event_id, event_type, value,
           |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
           |v AS (SELECT user_id, us AS from_us, value AS state_value,
           |        lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_us
           |      FROM e WHERE event_type = 'signup'),
           |p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase')
           |SELECT p.event_id, p.user_id, p.us AS purchase_us,
           |       v.from_us AS version_us, v.state_value
           |FROM p JOIN v ON p.user_id = v.user_id
           |  AND v.from_us <= p.us AND (v.to_us IS NULL OR p.us < v.to_us)
           |ORDER BY p.event_id""".stripMargin),
    (s, d) => {
      val e = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
      val v = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("us").as("from_us"),
          col("value").as("state_value"), lead("us", 1).over(w).as("to_us"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("us"))
      p.join(v, p("user_id") === v("user_id") &&
          v("from_us") <= p("us") &&
          (v("to_us").isNull || p("us") < v("to_us")))
        .select(p("event_id"), p("user_id"), p("us").as("purchase_us"),
          v("from_us").as("version_us"), v("state_value"))
        .orderBy("event_id")
    }
  )

  // ----------------------------------------------------------- pop revenue

  private val popRevenue = QueryDef(
    "q_pop_revenue",
    "Period-over-period reporting: exact monthly revenue with the " +
      "previous month's value and the month-over-month percent change " +
      "— the BI staple. Months key as year·12+month−1 so the previous " +
      "period is mkey−1 and the lookup is a plain EQUI self-join of " +
      "the tiny month-level aggregate — NO window at all, hence no " +
      "global sort and nothing single-partition at any scale. Revenue " +
      "sums as exact DECIMAL; the delta subtracts exactly in decimal " +
      "and the percent change is the single IEEE division at the end.",
    Some("""WITH m AS (SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mkey,
           |             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
           |           FROM orders GROUP BY 1)
           |SELECT CAST(a.mkey // 12 AS BIGINT) AS yr,
           |       CAST(a.mkey % 12 + 1 AS BIGINT) AS mon,
           |       CAST(a.rev AS DOUBLE) AS revenue,
           |       CAST(b.rev AS DOUBLE) AS prev_revenue,
           |       round(CAST(a.rev - b.rev AS DOUBLE) / CAST(b.rev AS DOUBLE) * 100, 6) AS mom_pct
           |FROM m a LEFT JOIN m b ON b.mkey = a.mkey - 1
           |ORDER BY a.mkey""".stripMargin),
    (s, d) => {
      val m = orders(s, d)
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("mkey"))
        .agg(sum(money(col("o_totalprice"))).as("rev"))
      val a = m.as("a"); val b = m.as("b")
      a.join(b, col("b.mkey") === col("a.mkey") - 1, "left")
        .select(lng(expr("a.mkey DIV 12")).as("yr"),
          lng(col("a.mkey") % 12 + 1).as("mon"),
          dbl(col("a.rev")).as("revenue"),
          dbl(col("b.rev")).as("prev_revenue"),
          round(dbl(col("a.rev") - col("b.rev")) / dbl(col("b.rev")) * 100, 6)
            .as("mom_pct"))
        .orderBy("yr", "mon")
    }
  )

  // ---------------------------------------------------------- pareto share

  private val paretoShare = QueryDef(
    "q_pareto_share",
    "Pareto-coverage shortlist (the 80/20 query): per nation, the " +
      "smallest revenue-ranked prefix of suppliers covering ≥ 80% of " +
      "the nation's revenue — keep suppliers while the cumulative " +
      "share BEFORE them is under 80%. Runs on the (nation, supplier) " +
      "aggregate, never the fact: one exact-decimal aggregation, a " +
      "broadcast nation-total join, and one window partitioned by " +
      "nation whose frame is exact-decimal cumulative sums (ties " +
      "broken by suppkey, threshold compared as 100·cum < 80·total in " +
      "exact decimal — no float share crosses an engine boundary " +
      "un-rounded).",
    Some("""WITH r AS (SELECT s.s_nationkey, l.l_suppkey,
           |             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
           |           FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |           GROUP BY 1, 2),
           |t AS (SELECT s_nationkey, sum(rev) AS total FROM r GROUP BY 1),
           |c AS (SELECT r.s_nationkey, r.l_suppkey, r.rev, t.total,
           |        sum(r.rev) OVER (PARTITION BY r.s_nationkey
           |          ORDER BY r.rev DESC, r.l_suppkey
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before,
           |        row_number() OVER (PARTITION BY r.s_nationkey
           |          ORDER BY r.rev DESC, r.l_suppkey) AS rnk
           |      FROM r JOIN t USING (s_nationkey))
           |SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
           |       l_suppkey AS suppkey, CAST(rnk AS BIGINT) AS rnk,
           |       CAST(rev AS DOUBLE) AS revenue
           |FROM c WHERE coalesce(100 * cum_before, 0) < 80 * total
           |ORDER BY nationkey, rnk""".stripMargin),
    (s, d) => {
      val r = lineitem(s, d).select(col("l_suppkey"), col("l_extendedprice"))
        .join(broadcast(supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(sum(money(col("l_extendedprice"))).as("rev"))
      val t = r.groupBy("s_nationkey").agg(sum("rev").as("total"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("s_nationkey").orderBy(col("rev").desc, col("l_suppkey"))
      val cum = sum("rev").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
      r.join(broadcast(t), "s_nationkey")
        .withColumn("cum_before", cum)
        .withColumn("rnk", row_number().over(w))
        .filter(coalesce(col("cum_before") * 100, lit(0)) < col("total") * 80)
        .select(lng(col("s_nationkey")).as("nationkey"),
          col("l_suppkey").as("suppkey"), lng(col("rnk")).as("rnk"),
          dbl(col("rev")).as("revenue"))
        .orderBy("nationkey", "rnk")
    }
  )

  // --------------------------------------------------------- bucketed join

  /** Buckets for the co-located join. 8 divides local[32] evenly; on a
    * cluster this is hundreds — the shape, not the constant, is pinned.
    */
  private val NBuckets = 8

  private val joinBucketed = QueryDef(
    "q_join_bucketed",
    "Bucketed co-located fact-fact join: lineitem and orders are " +
      "written ONCE as bucketed+sorted tables (bucketBy orderkey, " +
      s"$NBuckets buckets) and the revenue-by-priority join then " +
      "runs with NO shuffle and NO sort on either side — both scans " +
      "read bucket-aligned, pre-sorted files (BucketingSpec pins " +
      "zero exchanges under the merge join). This is THE " +
      "physical design decision for a 100 TB fact co-location: " +
      "shuffle each fact once at load, never again per query. " +
      "Tables are session-catalog entries keyed by sf name (bench " +
      "re-uses them across passes via tableExists; a fresh JVM " +
      "rewrites). The oracle runs the identical join on the raw " +
      "parquet — bucketing must not change a single row.",
    Some("""SELECT o.o_orderpriority,
           |       CAST(count(*) AS BIGINT) AS n_lines,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
           |                (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
           |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val sfTag = new java.io.File(d).getName.replace('.', '_')
      val liTbl = s"graft_li_bkt_$sfTag"
      val oTbl = s"graft_o_bkt_$sfTag"
      // a fresh JVM's in-memory catalog forgets the table but its
      // warehouse dir survives — saveAsTable would then refuse with
      // LOCATION_ALREADY_EXISTS, so drop the stale dir first
      def clearStale(tbl: String): Unit = {
        val wh = s.conf.get("spark.sql.warehouse.dir")
        val p = new org.apache.hadoop.fs.Path(s"$wh/$tbl")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      if (!s.catalog.tableExists(liTbl)) {
        clearStale(liTbl)
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .write.mode("overwrite")
          .bucketBy(NBuckets, "l_orderkey").sortBy("l_orderkey")
          .saveAsTable(liTbl)
      }
      if (!s.catalog.tableExists(oTbl)) {
        clearStale(oTbl)
        orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite")
          .bucketBy(NBuckets, "o_orderkey").sortBy("o_orderkey")
          .saveAsTable(oTbl)
      }
      // merge hint: the broadcast planner would otherwise eat the small
      // side at test SFs; at 100 TB neither fact side broadcasts
      s.table(liTbl).hint("merge")
        .join(s.table(oTbl), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(lng(count(lit(1))).as("n_lines"),
          dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * " +
            "(CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))")))
            .as("revenue"))
        .orderBy("o_orderpriority")
    }
  )

  /** Temperature-scaled mixture reweighting (τ = 1/2): the standard
    * multilingual/source-balancing step — sampling weights ∝ p^τ
    * upweight rare languages and downweight the head so no slice
    * dominates a training mix. τ = 1/2 keeps everything IEEE-exact
    * (p^τ = sqrt, a correctly-rounded primitive in both engines; no
    * transcendental pow). The ≤5-term weight denominator sums rounded
    * 6-decimal terms through exact DECIMAL so addition order is moot.
    * One aggregation of the corpus; everything after is a ≤5-row
    * broadcast.
    */
  private val mixTemperature = QueryDef(
    "q_mix_temperature",
    "Temperature (τ=1/2) mixture weights per language: raw share, " +
      "sqrt-scaled normalized sampling weight, effective sample count " +
      "— rare slices upweighted, the head damped.",
    Some("""WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
           |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g),
           |w AS (SELECT lang, n, round(sqrt(CAST(n AS DOUBLE) / total), 6) AS w_raw
           |      FROM g CROSS JOIN tot),
           |den AS (SELECT CAST(sum(CAST(w_raw AS DECIMAL(18,6))) AS DOUBLE) AS denom FROM w)
           |SELECT lang, n, w_raw, round(w_raw / denom, 6) AS mix_weight,
           |       CAST(round(w_raw / denom * total, 0) AS BIGINT) AS effective_n
           |FROM w CROSS JOIN den CROSS JOIN tot ORDER BY lang""".stripMargin),
    (s, d) => {
      val g = documents(s, d).groupBy("lang").agg(lng(count(lit(1))).as("n"))
      val tot = g.agg(lng(sum("n")).as("total"))
      val w = g.crossJoin(broadcast(tot))
        .withColumn("w_raw", round(sqrt(dbl(col("n")) / col("total")), 6))
      val den = w.agg(dbl(sum(col("w_raw").cast("decimal(18,6)"))).as("denom"))
      w.crossJoin(broadcast(den))
        .select(col("lang"), col("n"), col("w_raw"),
          round(col("w_raw") / col("denom"), 6).as("mix_weight"),
          lng(round(col("w_raw") / col("denom") * col("total"), 0)).as("effective_n"))
        .orderBy("lang")
    }
  )

  private val joinSkewAqe = QueryDef(
    "q_join_skew_aqe",
    "AQE-skew-join counterpart to q_join_salted (the runtime half of " +
      "the builder contract's \"salting or AQE for skew\" clause): a " +
      "planted 90%-hot join key (9 of every 10 lineitems collapse onto " +
      "k=0, the rest spread over k=1..15) joined MERGE-hinted to a " +
      "16-row nation slice — the shape where one shuffle partition " +
      "holds ~90% of the fact bytes and, unsplit, one straggler task " +
      "serializes the whole stage. No salting here by design: AQE's " +
      "skewJoin re-plans the hot partition into advisory-sized splits " +
      "at RUNTIME from the actual shuffle sizes (SkewBenchSpec executes " +
      "THIS query at sf0.1 and pins SortMergeJoin(skew=true) in the " +
      "final adaptive plan, with thresholds scaled to sandbox bytes the " +
      "way a 100 TB deployment scales them to executor memory). " +
      "Revenue per dim name; row-identical to the oracle's plain join.",
    Some("""SELECT n.n_name,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))
           |                * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           |       CAST(count(*) AS BIGINT) AS n_items
           |FROM (SELECT CASE WHEN l_orderkey % 100 < 90 THEN CAST(0 AS BIGINT)
           |                  ELSE 1 + (l_orderkey % 15) END AS k,
           |             l_extendedprice, l_discount
           |      FROM lineitem) l
           |JOIN (SELECT n_nationkey AS k, n_name FROM nation WHERE n_nationkey < 16) n
           |  ON l.k = n.k
           |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin),
    (s, d) => {
      val fact = lineitem(s, d).select(
        when(col("l_orderkey") % 100 < 90, lit(0L))
          .otherwise(lit(1L) + col("l_orderkey") % 15).as("k"),
        col("l_extendedprice"), col("l_discount"))
      val dim = nation(s, d).filter(col("n_nationkey") < 16)
        .select(col("n_nationkey").as("k"), col("n_name"))
      fact.join(dim.hint("merge"), "k")
        .groupBy("n_name")
        .agg(dbl(sum(expr(
          "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))")))
          .as("revenue"),
          lng(count(lit(1))).as("n_items"))
        .orderBy("n_name")
    }
  )

  /** t-closeness audit — the third rung of the release-gate ladder
    * ([[kAnon]] bounds group SIZE, [[lDiversity]] bounds sensitive
    * VARIETY, this bounds sensitive DISTRIBUTION SKEW): a group can be
    * large and diverse yet still leak if its sensitive distribution
    * differs sharply from the corpus's (Li et al., ICDE 2007). For the
    * categorical sensitive attribute the distance is total variation
    * ½·Σ|p_i − q_i| (EMD under the uniform ground metric), per
    * quasi-identifier group against the global distribution.
    *
    * Determinism: p_i = c_i/n and q_i = C_i/N are single divisions of
    * exact BIGINTs; each |p−q| term rounds to the 9-grid and sums as
    * exact DECIMAL (the l_diversity entropy discipline — a raw double
    * Σ over segments would be order-dependent), final ×0.5 and
    * round-6; the at_risk flag compares the ROUNDED tvd so both
    * engines flag identically.
    *
    * Scale: the same two-level shape as l_diversity — one fact
    * aggregation to ≤ QI×senses cells, then a senses-sized grid
    * (groups × segments, zero-filled so a segment MISSING from a
    * group still contributes |0 − q_i|) built from broadcast-tiny
    * frames. Nothing row-level survives the first groupBy.
    */
  private val tCloseness = QueryDef(
    "q_t_closeness",
    "t-closeness audit over the (nationkey, acctbal-bucket) " +
      "quasi-identifier: per group the size and the total-variation " +
      "distance between its mktsegment distribution and the global " +
      "one (zero-filled grid, 9-grid terms summed exactly), with the " +
      "at-risk flag for tvd > 0.2 - the release gate run after " +
      "q_k_anon and q_l_diversity.",
    Some("""WITH cells AS (
           |  SELECT c_nationkey,
           |         CASE WHEN c_acctbal < 0 THEN 'neg'
           |              WHEN c_acctbal < 5000 THEN 'mid'
           |              ELSE 'high' END AS bal_bucket,
           |         c_mktsegment, count(*) AS c
           |  FROM customer GROUP BY 1, 2, 3),
           |grp AS (SELECT c_nationkey, bal_bucket, sum(c) AS n FROM cells GROUP BY 1, 2),
           |gl AS (SELECT c_mktsegment, sum(c) AS cg FROM cells GROUP BY 1),
           |nn AS (SELECT sum(c) AS nt FROM cells),
           |grid AS (SELECT g.c_nationkey, g.bal_bucket, g.n, s.c_mktsegment, s.cg,
           |                coalesce(cells.c, 0) AS c
           |         FROM grp g CROSS JOIN gl s
           |         LEFT JOIN cells ON cells.c_nationkey = g.c_nationkey
           |           AND cells.bal_bucket = g.bal_bucket
           |           AND cells.c_mktsegment = s.c_mktsegment),
           |tv AS (SELECT c_nationkey, bal_bucket, n,
           |              round(0.5 * CAST(sum(CAST(round(abs(CAST(c AS DOUBLE) / n
           |                - CAST(cg AS DOUBLE) / nn.nt), 9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS tvd
           |       FROM grid CROSS JOIN nn GROUP BY 1, 2, 3)
           |SELECT c_nationkey, bal_bucket, CAST(n AS BIGINT) AS n, tvd,
           |       (tvd > 0.2) AS at_risk
           |FROM tv ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val bucket = when(col("c_acctbal") < 0, "neg")
        .when(col("c_acctbal") < 5000, "mid").otherwise("high")
      val cells = customer(s, d)
        .groupBy(col("c_nationkey"), bucket.as("bal_bucket"), col("c_mktsegment"))
        .agg(count(lit(1)).as("c"))
        .persist()
      val grp = cells.groupBy("c_nationkey", "bal_bucket").agg(sum("c").as("n"))
      val glob = cells.groupBy("c_mktsegment").agg(sum("c").as("cg"))
      val nn = cells.agg(sum("c").as("nt"))
      val term = round(abs(dbl(col("c")) / col("n") - dbl(col("cg")) / col("nt")), 9)
        .cast(org.apache.spark.sql.types.DecimalType(18, 9))
      grp.crossJoin(broadcast(glob))
        .join(cells, Seq("c_nationkey", "bal_bucket", "c_mktsegment"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(nn))
        .groupBy(col("c_nationkey"), col("bal_bucket"), col("n"))
        .agg(round(lit(0.5) * dbl(sum(term)), 6).as("tvd"))
        .select(col("c_nationkey"), col("bal_bucket"), lng(col("n")).as("n"),
          col("tvd"), (col("tvd") > 0.2).as("at_risk"))
        .transform(materializeThenRelease(_, cells))
        .orderBy("c_nationkey", "bal_bucket")
    }
  )

  val defs: Seq[QueryDef] = Seq(scd2, dataMix, joinSalted, quantileBucket,
    unpivot, kAnon, lDiversity, sampleWeighted, incrAgg, cdcApply, joinInterval,
    popRevenue, paretoShare, joinBucketed, mixTemperature, joinSkewAqe,
    tCloseness)
}
