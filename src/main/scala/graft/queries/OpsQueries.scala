package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Pipeline-operations operators (SURVEY.md §2.20): join-key skew
  * profiling, referential-integrity auditing, Holt linear smoothing,
  * CUSUM change-point detection, Flesch readability scoring, and
  * snapshot reconciliation (diff).
  *
  * Determinism (SURVEY.md §7.5): the two time-series recurrences run
  * in EXACT integer millicount arithmetic (Spark DIV and DuckDB //
  * both truncate toward zero, so even negative-trend steps agree);
  * money deltas are exact DECIMAL; the
  * remaining float columns are single shared IEEE chains over exact
  * integers rounded once.
  *
  * Scale shapes (PLANS.md): skew/integrity/diff aggregate the fact
  * first (map-side combined) and join only aggregate tables —
  * integrity's dimension probes broadcast, the fact-fact orphan check
  * is a key-partitioned anti join; the recurrences fold bounded
  * per-key series (hours per type) so keys scale out, never the
  * series.
  */
object OpsQueries {

  // ------------------------------------------------------------- skew report

  private val skewReport = QueryDef(
    "q_skew_report",
    "Join-key skew profile of the lineitem fact for its three join " +
      "keys (orderkey / partkey / suppkey): distinct keys, rows, max " +
      "and exact-interpolated p99 per-key cardinality, mean, and the " +
      "max/mean skew ratio — the report read before choosing " +
      "broadcast/salt/AQE strategies at 100 TB. Three map-side-" +
      "combined per-key aggregations; the statistics run over the " +
      "per-key count tables, never the fact again; all floats are " +
      "single divisions (percentile ⇔ quantile_cont, q_quantiles " +
      "precedent).",
    Some("""WITH k1 AS (SELECT 'l_orderkey' AS key_col, count(*) AS cnt FROM lineitem GROUP BY l_orderkey),
           |k2 AS (SELECT 'l_partkey' AS key_col, count(*) AS cnt FROM lineitem GROUP BY l_partkey),
           |k3 AS (SELECT 'l_suppkey' AS key_col, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
           |u AS (SELECT * FROM k1 UNION ALL SELECT * FROM k2 UNION ALL SELECT * FROM k3)
           |SELECT key_col, CAST(count(*) AS BIGINT) AS n_keys,
           |       CAST(sum(cnt) AS BIGINT) AS n_rows,
           |       CAST(max(cnt) AS BIGINT) AS max_cnt,
           |       round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
           |       round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS mean_cnt,
           |       round(CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt), 6) AS skew_ratio
           |FROM u GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val li = lineitem(s, d)
      def keyStats(c: String): DataFrame =
        li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          .select(lit(c).as("key_col"), col("cnt"))
      keyStats("l_orderkey")
        .unionAll(keyStats("l_partkey"))
        .unionAll(keyStats("l_suppkey"))
        .groupBy("key_col")
        .agg(lng(count(lit(1))).as("n_keys"), lng(sum("cnt")).as("n_rows"),
          lng(max("cnt")).as("max_cnt"),
          round(expr("percentile(cnt, 0.99)"), 6).as("p99_cnt"),
          round(dbl(sum("cnt")) / count(lit(1)), 6).as("mean_cnt"),
          round(dbl(max("cnt")) * count(lit(1)) / sum("cnt"), 6)
            .as("skew_ratio"))
        .orderBy("key_col")
    }
  )

  // -------------------------------------------------------------- integrity

  private val integrity = QueryDef(
    "q_integrity",
    "Referential-integrity audit across the star schema: for each " +
      "foreign-key relation, child row count and orphan count (child " +
      "keys with no parent) — the pre-flight data-quality gate. Each " +
      "orphan check is a LEFT ANTI join: dimension parents broadcast " +
      "(nation/part/supplier/customer), the lineitem→orders fact-fact " +
      "check hash-partitions on the shared key; counts are exact and " +
      "the five 1-row results union into one ≤5-row table.",
    Some("""SELECT 'customer->nation' AS rel,
           |       (SELECT count(*) FROM customer) AS n_rows,
           |       (SELECT count(*) FROM customer c LEFT JOIN nation n
           |          ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL) AS n_orphans
           |UNION ALL
           |SELECT 'lineitem->orders',
           |       (SELECT count(*) FROM lineitem),
           |       (SELECT count(*) FROM lineitem l LEFT JOIN orders o
           |          ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
           |UNION ALL
           |SELECT 'lineitem->part',
           |       (SELECT count(*) FROM lineitem),
           |       (SELECT count(*) FROM lineitem l LEFT JOIN part p
           |          ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
           |UNION ALL
           |SELECT 'lineitem->supplier',
           |       (SELECT count(*) FROM lineitem),
           |       (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
           |          ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
           |UNION ALL
           |SELECT 'orders->customer',
           |       (SELECT count(*) FROM orders),
           |       (SELECT count(*) FROM orders o LEFT JOIN customer c
           |          ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
           |ORDER BY rel""".stripMargin),
    (s, d) => {
      def audit(rel: String, child: DataFrame, childKey: String,
          parent: DataFrame, parentKey: String, bcast: Boolean): DataFrame = {
        val p = parent.select(parentKey)
        val orphans = child
          .join(if (bcast) broadcast(p) else p,
            col(childKey) === col(parentKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        child.agg(lng(count(lit(1))).as("n_rows"))
          .crossJoin(orphans)
          .select(lit(rel).as("rel"), col("n_rows"),
            lng(col("n_orphans")).as("n_orphans"))
      }
      audit("customer->nation", customer(s, d), "c_nationkey",
          nation(s, d), "n_nationkey", bcast = true)
        .unionAll(audit("lineitem->orders", lineitem(s, d), "l_orderkey",
          orders(s, d), "o_orderkey", bcast = false))
        .unionAll(audit("lineitem->part", lineitem(s, d), "l_partkey",
          part(s, d), "p_partkey", bcast = true))
        .unionAll(audit("lineitem->supplier", lineitem(s, d), "l_suppkey",
          supplier(s, d), "s_suppkey", bcast = true))
        .unionAll(audit("orders->customer", orders(s, d), "o_custkey",
          customer(s, d), "c_custkey", bcast = true))
        .orderBy("rel")
    }
  )

  // ------------------------------------------------------------------- holt

  private val holt = QueryDef(
    "q_holt",
    "Holt linear (level + trend) smoothing of hourly event counts per " +
      "type, α=β=1/2, in EXACT integer millicounts: level ← " +
      "(l+b+1000·x) div 2, trend ← (b+Δlevel) div 2. Both engines' " +
      "integer division (Spark DIV, DuckDB //) truncates toward zero, " +
      "so the recurrence is engine-exact even for negative trends. " +
      "Spark folds each " +
      "type's sorted bounded series with the aggregate() HOF (q_ewma " +
      "shape: keys scale out, series bounded by the time range); the " +
      "oracle replays the recurrence as a recursive CTE. Emits the " +
      "final level, trend, and one-step forecast.",
    Some("""WITH RECURSIVE h AS (SELECT event_type,
           |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour,
           |         count(*) AS cnt
           |       FROM events GROUP BY 1, 2),
           |idx AS (SELECT event_type, hour, cnt,
           |          row_number() OVER (PARTITION BY event_type ORDER BY hour) AS i,
           |          count(*) OVER (PARTITION BY event_type) AS n
           |        FROM h),
           |r(event_type, i, n, l, b) AS (
           |  SELECT event_type, i, n, 1000 * cnt, CAST(0 AS BIGINT) FROM idx WHERE i = 1
           |  UNION ALL
           |  SELECT idx.event_type, idx.i, idx.n,
           |         (r.l + r.b + 1000 * idx.cnt) // 2,
           |         (r.b + ((r.l + r.b + 1000 * idx.cnt) // 2 - r.l)) // 2
           |  FROM r JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1)
           |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           |       CAST(l AS BIGINT) AS level_milli, CAST(b AS BIGINT) AS trend_milli,
           |       CAST(l + b AS BIGINT) AS forecast_milli
           |FROM r WHERE i = n ORDER BY event_type""".stripMargin),
    (s, d) => {
      val h = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("hour"))
        .agg(count(lit(1)).as("cnt"))
      h.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hour"), col("cnt"))))
          .as("series"))
        .select(col("event_type"), lng(size(col("series"))).as("n_hours"),
          expr(
            """aggregate(slice(series, 2, size(series) - 1),
              |  named_struct('l', 1000L * series[0].cnt, 'b', 0L),
              |  (acc, x) -> named_struct(
              |    'l', (acc.l + acc.b + 1000L * x.cnt) DIV 2L,
              |    'b', (acc.b + ((acc.l + acc.b + 1000L * x.cnt) DIV 2L - acc.l)) DIV 2L))"""
              .stripMargin).as("st"))
        .select(col("event_type"), col("n_hours"),
          lng(col("st.l")).as("level_milli"), lng(col("st.b")).as("trend_milli"),
          lng(col("st.l") + col("st.b")).as("forecast_milli"))
        .orderBy("event_type")
    }
  )

  // ------------------------------------------------------------- changepoint

  private val changepoint = QueryDef(
    "q_changepoint",
    "One-sided CUSUM change-point screen on hourly event counts per " +
      "type: S ← max(0, S + 1000·x − mean_milli) with the per-type " +
      "mean in exact millicounts; reports the peak CUSUM and the hour " +
      "where the peak was FIRST reached — the drift detector run on " +
      "ingest volumes. Pure integer adds and max (no division in the " +
      "recurrence — nothing to round anywhere); same bounded-series " +
      "fold as q_ewma/q_holt, with the per-type mean computed in the " +
      "same aggregation that collects the series; oracle = recursive " +
      "CTE.",
    Some("""WITH RECURSIVE h AS (SELECT event_type,
           |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour,
           |         count(*) AS cnt
           |       FROM events GROUP BY 1, 2),
           |m AS (SELECT event_type, (1000 * sum(cnt)) // count(*) AS mean_milli FROM h GROUP BY 1),
           |idx AS (SELECT h.event_type, h.hour, h.cnt, m.mean_milli,
           |          row_number() OVER (PARTITION BY h.event_type ORDER BY h.hour) AS i,
           |          count(*) OVER (PARTITION BY h.event_type) AS n
           |        FROM h JOIN m USING (event_type)),
           |r(event_type, i, n, mean_milli, s, smax, hmax) AS (
           |  SELECT event_type, i, n, mean_milli,
           |         greatest(CAST(0 AS BIGINT), 1000 * cnt - mean_milli),
           |         greatest(CAST(0 AS BIGINT), 1000 * cnt - mean_milli), hour
           |  FROM idx WHERE i = 1
           |  UNION ALL
           |  SELECT idx.event_type, idx.i, idx.n, idx.mean_milli,
           |         greatest(CAST(0 AS BIGINT), r.s + 1000 * idx.cnt - idx.mean_milli),
           |         CASE WHEN greatest(CAST(0 AS BIGINT), r.s + 1000 * idx.cnt - idx.mean_milli) > r.smax
           |              THEN greatest(CAST(0 AS BIGINT), r.s + 1000 * idx.cnt - idx.mean_milli)
           |              ELSE r.smax END,
           |         CASE WHEN greatest(CAST(0 AS BIGINT), r.s + 1000 * idx.cnt - idx.mean_milli) > r.smax
           |              THEN idx.hour ELSE r.hmax END
           |  FROM r JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1)
           |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
           |       CAST(mean_milli AS BIGINT) AS mean_milli,
           |       CAST(smax AS BIGINT) AS peak_cusum_milli,
           |       CAST(hmax AS BIGINT) AS peak_hour
           |FROM r WHERE i = n ORDER BY event_type""".stripMargin),
    (s, d) => {
      val h = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("hour"))
        .agg(count(lit(1)).as("cnt"))
      h.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hour"), col("cnt"))))
            .as("series"),
          expr("(1000 * sum(cnt)) DIV count(*)").as("mean_milli"))
        .select(col("event_type"), lng(size(col("series"))).as("n_hours"),
          lng(col("mean_milli")).as("mean_milli"),
          expr(
            """aggregate(slice(series, 2, size(series) - 1),
              |  named_struct(
              |    's', greatest(0L, 1000L * series[0].cnt - mean_milli),
              |    'smax', greatest(0L, 1000L * series[0].cnt - mean_milli),
              |    'hmax', series[0].hour),
              |  (acc, x) -> named_struct(
              |    's', greatest(0L, acc.s + 1000L * x.cnt - mean_milli),
              |    'smax', CASE WHEN greatest(0L, acc.s + 1000L * x.cnt - mean_milli) > acc.smax
              |                 THEN greatest(0L, acc.s + 1000L * x.cnt - mean_milli)
              |                 ELSE acc.smax END,
              |    'hmax', CASE WHEN greatest(0L, acc.s + 1000L * x.cnt - mean_milli) > acc.smax
              |                 THEN x.hour ELSE acc.hmax END))""".stripMargin)
            .as("st"))
        .select(col("event_type"), col("n_hours"), col("mean_milli"),
          lng(col("st.smax")).as("peak_cusum_milli"),
          lng(col("st.hmax")).as("peak_hour"))
        .orderBy("event_type")
    }
  )

  // ------------------------------------------------------------- readability

  private val readability = QueryDef(
    "q_readability",
    "Flesch reading-ease score per document: words by whitespace " +
      "split, sentences as terminal-punctuation count (min 1), " +
      "syllables approximated as lowercase vowel groups via one " +
      "regexp_extract_all — the readability screen in corpus quality " +
      "filtering. All three inputs are exact integer counts with " +
      "identical regex semantics in both engines; the Flesch formula " +
      "is one shared double chain rounded once. Pure per-row scan " +
      "work — zero shuffles before the final sort.",
    Some("""SELECT doc_id,
           |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           |       CAST(greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g'))) AS BIGINT) AS n_sentences,
           |       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables,
           |       round(206.835
           |             - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
           |                        / greatest(1, length(regexp_replace(text, '[^.!?]', '', 'g'))))
           |             - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
           |                       / len(string_split(text, ' '))), 6) AS flesch
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) =>
      documents(s, d).selectExpr(
        "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_words",
        "CAST(greatest(1, length(regexp_replace(text, '[^.!?]', ''))) AS BIGINT) AS n_sentences",
        "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT) AS n_syllables",
        """round(206.835
          | - 1.015 * (CAST(size(split(text, ' ')) AS DOUBLE)
          |            / greatest(1, length(regexp_replace(text, '[^.!?]', ''))))
          | - 84.6 * (CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS DOUBLE)
          |           / size(split(text, ' '))), 6) AS flesch""".stripMargin)
        .orderBy("doc_id")
  )

  // ---------------------------------------------------------- snapshot diff

  private val snapshotDiff = QueryDef(
    "q_snapshot_diff",
    "Snapshot reconciliation: per-customer order totals in two " +
      "overlapping windows (1995–1998 vs 1997–2000) FULL OUTER joined " +
      "on custkey and classified added / removed / changed / " +
      "unchanged, with the exact-DECIMAL absolute delta per class — " +
      "the diff report run when validating a pipeline migration. Two " +
      "filtered aggregations of the same fact (both hash-partition on " +
      "o_custkey), one key-partitioned full outer join of the " +
      "per-customer aggregates, one ≤4-row final rollup; deltas stay " +
      "DECIMAL until the single boundary cast.",
    Some("""WITH a AS (SELECT o_custkey, count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
           |           FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
           |             AND o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1),
           |b AS (SELECT o_custkey, count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
           |      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
           |        AND o_orderdate < TIMESTAMP '2001-01-01' GROUP BY 1),
           |j AS (SELECT CASE WHEN a.o_custkey IS NULL THEN 'added'
           |                  WHEN b.o_custkey IS NULL THEN 'removed'
           |                  WHEN a.t = b.t AND a.n = b.n THEN 'unchanged'
           |                  ELSE 'changed' END AS change_type,
           |             abs(coalesce(b.t, 0) - coalesce(a.t, 0)) AS adelta
           |      FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey)
           |SELECT change_type, CAST(count(*) AS BIGINT) AS n_customers,
           |       CAST(sum(adelta) AS DOUBLE) AS total_abs_delta
           |FROM j GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
      def snap(lo: String, hi: String): DataFrame =
        o.filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
            col("o_orderdate") < lit(hi).cast("timestamp"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), sum(money(col("o_totalprice"))).as("t"))
      val a = snap("1995-01-01", "1999-01-01")
        .select(col("o_custkey").as("ak"), col("n").as("an"), col("t").as("at"))
      val b = snap("1997-01-01", "2001-01-01")
        .select(col("o_custkey").as("bk"), col("n").as("bn"), col("t").as("bt"))
      a.join(b, col("ak") === col("bk"), "full_outer")
        .select(
          when(col("ak").isNull, "added")
            .when(col("bk").isNull, "removed")
            .when(col("at") === col("bt") && col("an") === col("bn"),
              "unchanged")
            .otherwise("changed").as("change_type"),
          abs(coalesce(col("bt"), lit(0)) - coalesce(col("at"), lit(0)))
            .as("adelta"))
        .groupBy("change_type")
        .agg(lng(count(lit(1))).as("n_customers"),
          dbl(sum(col("adelta"))).as("total_abs_delta"))
        .orderBy("change_type")
    }
  )

  // ------------------------------------------------------------ filter funnel

  private val filterFunnel = QueryDef(
    "q_filter_funnel",
    "Curation-funnel report: survivor counts after each cumulative " +
      "filter stage — length band (200–2000 chars), major-language " +
      "keep-list, ≥50 alphabetic tokens, and prefix-40 exact-" +
      "uniqueness — the observability table every corpus pipeline " +
      "publishes so a mis-tuned filter that silently eats the corpus " +
      "is caught from the stage deltas, not downstream. All counts " +
      "are exact BIGINTs from ONE corpus pass: docs pre-aggregate by " +
      "md5 of the 40-char prefix (16-byte digests shuffle, never " +
      "document bodies — q_dedup_exact's discipline) carrying " +
      "conditional stage counts, map-side combined; the uniqueness " +
      "stage is then sum(stage-3 count WHERE group size = 1) on the " +
      "digest table — no join, no second scan.",
    Some("""WITH f AS (SELECT md5(substr(text, 1, 40)) AS h,
           |    (n_chars BETWEEN 200 AND 2000) AS f_len,
           |    (lang IN ('en', 'de', 'fr', 'es')) AS f_lang,
           |    (len(regexp_extract_all(lower(text), '([a-z]+)', 1)) >= 50) AS f_tok
           |  FROM documents),
           |g AS (SELECT h, count(*) AS cnt,
           |        count(*) FILTER (WHERE f_len) AS c1,
           |        count(*) FILTER (WHERE f_len AND f_lang) AS c2,
           |        count(*) FILTER (WHERE f_len AND f_lang AND f_tok) AS c3
           |      FROM f GROUP BY 1)
           |SELECT CAST(sum(cnt) AS BIGINT) AS n_all,
           |  CAST(sum(c1) AS BIGINT) AS n_len,
           |  CAST(sum(c2) AS BIGINT) AS n_lang,
           |  CAST(sum(c3) AS BIGINT) AS n_tok,
           |  CAST(coalesce(sum(CASE WHEN cnt = 1 THEN c3 END), 0) AS BIGINT) AS n_unique
           |FROM g""".stripMargin),
    (s, d) => {
      val f = documents(s, d).select(
        md5(substring(col("text"), 1, 40)).as("h"),
        (col("n_chars").between(200, 2000)).as("f_len"),
        col("lang").isin("en", "de", "fr", "es").as("f_lang"),
        (size(expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")) >= 50)
          .as("f_tok"))
      val g = f.groupBy("h")
        .agg(count(lit(1)).as("cnt"),
          count(when(col("f_len"), 1)).as("c1"),
          count(when(col("f_len") && col("f_lang"), 1)).as("c2"),
          count(when(col("f_len") && col("f_lang") && col("f_tok"), 1))
            .as("c3"))
      g.agg(lng(sum("cnt")).as("n_all"), lng(sum("c1")).as("n_len"),
        lng(sum("c2")).as("n_lang"), lng(sum("c3")).as("n_tok"),
        lng(coalesce(sum(when(col("cnt") === 1, col("c3"))), lit(0L)))
          .as("n_unique"))
    }
  )

  // -------------------------------------------------------------------- stl

  /** Classical seasonal decomposition (the STL-shaped additive
    * trend/seasonal/residual split) of the gap-filled hourly event
    * series per type, with the top anomalies by residual — the
    * decomposition q_seasonality (profile only), q_holt (level/trend
    * only) and q_changepoint (mean shifts only) each cover one third
    * of.
    *
    * All-integer pipeline: the 25-point centered moving average ×1000
    * is sum×40 EXACTLY (25·40 = 1000), so trend is an exact BIGINT
    * millicount; detrended = 1000·cnt − trend is exact; the per
    * (type, hour-of-day) seasonal mean and its centering both use
    * integer division (truncating toward zero in BOTH engines — holt
    * precedent), so every component and residual is engine-exact with
    * no float anywhere.
    *
    * Scale: the gap-filled grid is (hours × types) — time-range
    * bounded, not corpus bounded; all windows partition by event_type;
    * the seasonal table is ≤ types×24 rows joined back by broadcast.
    * At 100 TB the only thing that grows is the one map-side-combined
    * count feeding the grid.
    */
  private val stl = QueryDef(
    "q_stl",
    "Additive seasonal decomposition of gap-filled hourly event " +
      "counts per type: trend = exact 25-point centered MA " +
      "(millicounts), seasonal = centered per-hour-of-day mean of the " +
      "detrended interior, residual = detrended − seasonal; emits the " +
      "top-20 anomalies by |residual| — all-integer, engine-exact.",
    Some("""WITH e AS (SELECT event_type,
           |                  epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h FROM events),
           |b AS (SELECT min(h) AS hmin, max(h) AS hmax FROM e),
           |hours AS (SELECT unnest(generate_series(hmin, hmax)) AS h FROM b),
           |types AS (SELECT DISTINCT event_type FROM e),
           |grid AS (SELECT event_type, h FROM hours CROSS JOIN types),
           |c AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
           |s AS (SELECT g.event_type, g.h, coalesce(c.n, 0) AS cnt
           |      FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h),
           |idx AS (SELECT event_type, h, cnt,
           |          row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
           |          count(*) OVER (PARTITION BY event_type) AS nt,
           |          sum(cnt) OVER (PARTITION BY event_type ORDER BY h
           |                         ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) * 40 AS trend
           |        FROM s),
           |interior AS (SELECT event_type, h, h % 24 AS hod, cnt, trend,
           |               1000 * cnt - trend AS det
           |             FROM idx WHERE i > 12 AND i <= nt - 12),
           |s0 AS (SELECT event_type, hod, sum(det) // count(*) AS s0
           |       FROM interior GROUP BY 1, 2),
           |ms AS (SELECT event_type, sum(s0) // count(*) AS m FROM s0 GROUP BY 1),
           |seas AS (SELECT s0.event_type, s0.hod, s0.s0 - ms.m AS seasonal
           |         FROM s0 JOIN ms ON s0.event_type = ms.event_type)
           |SELECT i.event_type, CAST(i.h AS BIGINT) AS h,
           |       CAST(i.hod AS BIGINT) AS hod, CAST(i.cnt AS BIGINT) AS cnt,
           |       CAST(i.trend AS BIGINT) AS trend_milli,
           |       CAST(seas.seasonal AS BIGINT) AS seasonal_milli,
           |       CAST(i.det - seas.seasonal AS BIGINT) AS resid_milli
           |FROM interior i JOIN seas ON i.event_type = seas.event_type AND i.hod = seas.hod
           |ORDER BY abs(i.det - seas.seasonal) DESC, i.event_type, i.h
           |LIMIT 20""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d)
        .select(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("h")).persist()
      val hours = e.agg(min("h").as("hmin"), max("h").as("hmax"))
        .select(explode(sequence(col("hmin"), col("hmax"))).as("h"))
      val types = e.select("event_type").distinct()
      val counts = e.groupBy("event_type", "h").agg(count(lit(1)).as("n"))
      val grid = hours.crossJoin(broadcast(types))
        .join(counts, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("n"), lit(0L)).as("cnt"))
      val wOrd = Window.partitionBy("event_type").orderBy("h")
      val wMa = wOrd.rowsBetween(-12, 12)
      val wAll = Window.partitionBy("event_type")
      val interior = grid
        .withColumn("i", row_number().over(wOrd))
        .withColumn("nt", count(lit(1)).over(wAll))
        .withColumn("trend", sum("cnt").over(wMa) * 40)
        .filter(col("i") > 12 && col("i") <= col("nt") - 12)
        .select(col("event_type"), col("h"), (col("h") % 24).as("hod"),
          col("cnt"), col("trend"),
          (lit(1000) * col("cnt") - col("trend")).as("det"))
        .persist()
      val s0 = interior.groupBy("event_type", "hod")
        .agg(expr("sum(det) DIV count(*)").as("s0"))
      // center over the hod groups actually PRESENT (= 24 once the
      // interior spans a full day, but a short-range events table has
      // fewer — dividing by a literal 24 would mis-center; review r10)
      val ms = s0.groupBy("event_type")
        .agg(expr("sum(s0) DIV count(*)").as("m"))
      val seas = s0.join(broadcast(ms), "event_type")
        .select(col("event_type"), col("hod"), (col("s0") - col("m")).as("seasonal"))
      interior.join(broadcast(seas), Seq("event_type", "hod"))
        .select(col("event_type"), lng(col("h")).as("h"), lng(col("hod")).as("hod"),
          lng(col("cnt")).as("cnt"), lng(col("trend")).as("trend_milli"),
          lng(col("seasonal")).as("seasonal_milli"),
          lng(col("det") - col("seasonal")).as("resid_milli"))
        .orderBy(abs(col("resid_milli")).desc, col("event_type"), col("h"))
        .limit(20)
    }
  )

  /** AR(1) autoregression per event type — the STOCHASTIC member of
    * the forecasting family (q_holt smooths level+trend, q_stl
    * decomposes, q_seasonality detects the cycle, q_autocorr measures
    * the dependence; this FITS the dependence and forecasts from it):
    * the daily value-total series x_t regressed on its own lag,
    * x_t = c + φ·x_{t−1}, by closed-form OLS over the lagged pairs,
    * plus the one-step-ahead forecast c + φ·x_n — the simplest
    * model a capacity-planning/anomaly stack runs per metric.
    *
    * Determinism: daily totals are exact DECIMAL(18,2) sums; the five
    * co-moments (n, Σx, Σy, Σxx, Σxy over lagged pairs) are exact
    * decimal sums and φ/c/forecast are ONE shared double chain over
    * them, each rounded 6 (the q_regression discipline). The lag is a
    * key-partitioned equi-join on (type, day−1) — no window at all.
    *
    * Scale: one map-side-combined fact pass to types×days rows, one
    * tiny self-join for the lag, a 5-aggregate rollup per type.
    */
  private val ar1 = QueryDef(
    "q_ar1",
    "AR(1) fit of the daily value-total series per event type " +
      "(closed-form OLS on the lag-joined pairs: phi, intercept, and " +
      "the one-step-ahead forecast) — the per-metric autoregressive " +
      "forecaster of a capacity/anomaly stack.",
    Some("""WITH dly AS (SELECT event_type,
           |               epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
           |               sum(CAST(value AS DECIMAL(18,2))) AS x
           |             FROM events GROUP BY 1, 2),
           |pairs AS (SELECT a.event_type, a.day, a.x AS y, b.x AS xl
           |          FROM dly a JOIN dly b ON b.event_type = a.event_type
           |                             AND b.day = a.day - 1),
           |m AS (SELECT event_type, count(*) AS n, sum(xl) AS sx, sum(y) AS sy,
           |             sum(xl * xl) AS sxx, sum(xl * y) AS sxy
           |      FROM pairs GROUP BY 1),
           |lastd AS (SELECT event_type, max(day) AS md FROM dly GROUP BY 1),
           |xn AS (SELECT d.event_type, d.x AS xlast
           |       FROM dly d JOIN lastd l ON l.event_type = d.event_type AND d.day = l.md),
           |f AS (SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           |        round((m.n * CAST(m.sxy AS DOUBLE) - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
           |              / nullif(m.n * CAST(m.sxx AS DOUBLE) - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE), 0), 6) AS phi,
           |        round((CAST(m.sy AS DOUBLE)
           |               - (m.n * CAST(m.sxy AS DOUBLE) - CAST(m.sx AS DOUBLE) * CAST(m.sy AS DOUBLE))
           |                 / nullif(m.n * CAST(m.sxx AS DOUBLE) - CAST(m.sx AS DOUBLE) * CAST(m.sx AS DOUBLE), 0)
           |                 * CAST(m.sx AS DOUBLE)) / m.n, 6) AS c,
           |        xn.xlast
           |      FROM m JOIN xn ON xn.event_type = m.event_type)
           |SELECT event_type, n, phi, c,
           |       round(c + phi * CAST(xlast AS DOUBLE), 6) AS forecast
           |FROM f ORDER BY event_type""".stripMargin),
    (s, d) => {
      val dly = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(money(col("value"))).as("x"))
      val pairs = dly.as("a")
        .join(dly.select(col("event_type"), (col("day") + 1).as("day"),
          col("x").as("xl")).as("b"), Seq("event_type", "day"))
      val m = pairs.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("xl").as("sx"), sum(col("a.x")).as("sy"),
          sum(col("xl") * col("xl")).as("sxx"),
          sum(col("xl") * col("a.x")).as("sxy"))
      val lastd = dly.groupBy("event_type").agg(max("day").as("md"))
      val xn = dly.join(lastd, Seq("event_type"))
        .filter(col("day") === col("md"))
        .select(col("event_type"), col("x").as("xlast"))
      // combine the exact decimal co-moments in ONE shared double
      // chain (decimal n·sxy would exceed precision 38 and the two
      // engines truncate differently; identical IEEE is the parity)
      val num = col("n") * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))
      // nullif guard (ADVICE r12): a constant lagged series makes the
      // OLS denominator 0 — both engines must agree NULL, not inf/NaN
      val den = nullif(
        col("n") * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")), lit(0.0))
      val phi = round(num / den, 6)
      val c = round((dbl(col("sy")) - num / den * dbl(col("sx"))) / col("n"), 6)
      m.join(broadcast(xn), "event_type")
        .select(col("event_type"), lng(col("n")).as("n"),
          phi.as("phi"), c.as("c"),
          round(c + phi * dbl(col("xlast")), 6).as("forecast"))
        .orderBy("event_type")
    }
  )

  // ----------------------------------------------------------------- binseg

  private val binseg = QueryDef(
    "q_binseg",
    "Two-level binary segmentation of hourly counts per type — the " +
      "HIERARCHICAL changepoint next to q_changepoint's single CUSUM " +
      "peak and q_cusum's sequential alarm: level 1 picks the split " +
      "minimizing total within-segment SSE, level 2 picks the best " +
      "second split on either side of it (greedy binseg, the textbook " +
      "K-changepoint heuristic). THE CLOSED FORM that makes it " +
      "window-expressible: SSE(a..b) = Σx² − (Σx)²/len over any " +
      "segment is a pure function of two PREFIX SUMS, so every " +
      "candidate split's cost is one row of the windowed hour table — " +
      "no recursion, no per-split rescan (contrast q_changepoint's " +
      "recursive-CTE oracle). Costs are one shared double chain over " +
      "exact BIGINT prefix sums; argmin is row_number under the total " +
      "order (cost, i). Everything runs on the hour×type aggregate; " +
      "the level-1 winner table is ≤|types| rows and broadcasts back. " +
      "Output pins the SSE ladder sse0 > sse1 > sse2 (each split " +
      "strictly reduces variance) with both changepoint hours.",
    Some("""WITH h AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |             count(*) AS cnt FROM events GROUP BY 1, 2),
           |p AS (SELECT event_type, hr, cnt,
           |        row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i,
           |        sum(cnt) OVER (PARTITION BY event_type ORDER BY hr
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
           |        sum(cnt*cnt) OVER (PARTITION BY event_type ORDER BY hr
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS css,
           |        count(*) OVER (PARTITION BY event_type) AS n,
           |        sum(cnt) OVER (PARTITION BY event_type) AS cst,
           |        sum(cnt*cnt) OVER (PARTITION BY event_type) AS csst
           |      FROM h),
           |c1 AS (SELECT *,
           |         (CAST(css AS DOUBLE) - CAST(cs AS DOUBLE)*CAST(cs AS DOUBLE)/i)
           |         + (CAST(csst - css AS DOUBLE)
           |            - CAST(cst - cs AS DOUBLE)*CAST(cst - cs AS DOUBLE)/(n - i)) AS cost
           |       FROM p WHERE i < n),
           |k1 AS (SELECT event_type, i AS k1, hr AS cp1_hr, cost AS sse1, n, cst, csst,
           |         cs AS cs_k1, css AS css_k1
           |       FROM (SELECT *, row_number() OVER (PARTITION BY event_type
           |               ORDER BY cost, i) AS rn FROM c1) WHERE rn = 1),
           |c2 AS (SELECT p.event_type, p.i AS j, p.hr,
           |         CASE WHEN p.i < k1.k1 THEN 'left' ELSE 'right' END AS side,
           |         CASE WHEN p.i < k1.k1 THEN
           |           (CAST(p.css AS DOUBLE) - CAST(p.cs AS DOUBLE)*CAST(p.cs AS DOUBLE)/p.i)
           |           + (CAST(k1.css_k1 - p.css AS DOUBLE)
           |              - CAST(k1.cs_k1 - p.cs AS DOUBLE)*CAST(k1.cs_k1 - p.cs AS DOUBLE)/(k1.k1 - p.i))
           |           + (CAST(k1.csst - k1.css_k1 AS DOUBLE)
           |              - CAST(k1.cst - k1.cs_k1 AS DOUBLE)*CAST(k1.cst - k1.cs_k1 AS DOUBLE)/(k1.n - k1.k1))
           |         ELSE
           |           (CAST(k1.css_k1 AS DOUBLE) - CAST(k1.cs_k1 AS DOUBLE)*CAST(k1.cs_k1 AS DOUBLE)/k1.k1)
           |           + (CAST(p.css - k1.css_k1 AS DOUBLE)
           |              - CAST(p.cs - k1.cs_k1 AS DOUBLE)*CAST(p.cs - k1.cs_k1 AS DOUBLE)/(p.i - k1.k1))
           |           + (CAST(k1.csst - p.css AS DOUBLE)
           |              - CAST(k1.cst - p.cs AS DOUBLE)*CAST(k1.cst - p.cs AS DOUBLE)/(k1.n - p.i))
           |         END AS cost
           |       FROM p JOIN k1 ON p.event_type = k1.event_type
           |       WHERE p.i < k1.n AND p.i <> k1.k1),
           |k2 AS (SELECT event_type, hr AS cp2_hr, side, cost AS sse2
           |       FROM (SELECT *, row_number() OVER (PARTITION BY event_type
           |               ORDER BY cost, j) AS rn FROM c2) WHERE rn = 1)
           |SELECT k1.event_type, CAST(k1.n AS BIGINT) AS n_hours,
           |       round(CAST(k1.csst AS DOUBLE)
           |             - CAST(k1.cst AS DOUBLE)*CAST(k1.cst AS DOUBLE)/k1.n, 6) AS sse0,
           |       CAST(k1.cp1_hr AS BIGINT) AS cp1_hr, round(k1.sse1, 6) AS sse1,
           |       k2.side AS cp2_side, CAST(k2.cp2_hr AS BIGINT) AS cp2_hr,
           |       round(k2.sse2, 6) AS sse2
           |FROM k1 JOIN k2 USING (event_type) ORDER BY event_type""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = events(s, d)
        .groupBy(col("event_type"),
          expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000").as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val wo = Window.partitionBy("event_type").orderBy("hr")
      val wc = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wa = Window.partitionBy("event_type")
      val p = h.select(col("event_type"), col("hr"), col("cnt"),
          row_number().over(wo).as("i"),
          sum(col("cnt")).over(wc).as("cs"),
          sum(col("cnt") * col("cnt")).over(wc).as("css"),
          count(lit(1)).over(wa).as("n"),
          sum(col("cnt")).over(wa).as("cst"),
          sum(col("cnt") * col("cnt")).over(wa).as("csst"))
        .persist() // consumed by level 1 and the level-2 candidate join
      def sse(ss: org.apache.spark.sql.Column, sm: org.apache.spark.sql.Column,
              len: org.apache.spark.sql.Column) =
        dbl(ss) - dbl(sm) * dbl(sm) / len
      val c1 = p.filter(col("i") < col("n"))
        .withColumn("cost",
          sse(col("css"), col("cs"), col("i")) +
          sse(col("csst") - col("css"), col("cst") - col("cs"), col("n") - col("i")))
      val wk = Window.partitionBy("event_type").orderBy("cost", "i")
      val k1 = c1.withColumn("rn", row_number().over(wk)).filter(col("rn") === 1)
        .select(col("event_type"), col("i").as("k1"), col("hr").as("cp1_hr"),
          col("cost").as("sse1"), col("n").as("n1"), col("cst").as("cst1"),
          col("csst").as("csst1"), col("cs").as("cs_k1"), col("css").as("css_k1"))
      val c2 = p.join(broadcast(k1), "event_type")
        .filter(col("i") < col("n1") && col("i") =!= col("k1"))
        .withColumn("side",
          when(col("i") < col("k1"), lit("left")).otherwise(lit("right")))
        .withColumn("cost",
          when(col("i") < col("k1"),
            sse(col("css"), col("cs"), col("i")) +
            sse(col("css_k1") - col("css"), col("cs_k1") - col("cs"),
              col("k1") - col("i")) +
            sse(col("csst1") - col("css_k1"), col("cst1") - col("cs_k1"),
              col("n1") - col("k1")))
          .otherwise(
            sse(col("css_k1"), col("cs_k1"), col("k1")) +
            sse(col("css") - col("css_k1"), col("cs") - col("cs_k1"),
              col("i") - col("k1")) +
            sse(col("csst1") - col("css"), col("cst1") - col("cs"),
              col("n1") - col("i"))))
      val wj = Window.partitionBy("event_type").orderBy("cost", "i")
      val k2 = c2.withColumn("rn", row_number().over(wj)).filter(col("rn") === 1)
        .select(col("event_type"), col("hr").as("cp2_hr"), col("side"),
          col("cost").as("sse2"))
      val out = k1.join(k2, "event_type")
        .select(col("event_type"), lng(col("n1")).as("n_hours"),
          round(sse(col("csst1"), col("cst1"), col("n1")), 6).as("sse0"),
          lng(col("cp1_hr")).as("cp1_hr"), round(col("sse1"), 6).as("sse1"),
          col("side").as("cp2_side"), lng(col("cp2_hr")).as("cp2_hr"),
          round(col("sse2"), 6).as("sse2"))
        .orderBy("event_type")
      materializeThenRelease(out, p)
    }
  )

  /** Matrix profile (exact, brute-force) of the daily order-revenue
    * series — the MOTIF/DISCORD member of the time-series family
    * (q_autocorr measures global dependence, q_binseg/q_cusum find
    * level changes; the matrix profile finds the nearest NEIGHBOR of
    * every subsequence, whose minima are repeated motifs and maxima
    * are discords/anomalies — Yeh et al., ICDM'16). For each length-16
    * window i, the smallest z-normalized distance to any window j
    * with |i−j| ≥ 8 (the standard m/2 trivial-match exclusion), plus
    * that neighbor's index.
    *
    * THE DETERMINISM TRICK (the Louvain/microrank discipline applied
    * to a float-heavy algorithm): daily revenue in CENTS is an exact
    * DECIMAL, so every window sum S_i, sum-of-squares Q_i and sliding
    * dot product QT(i,j) is EXACT integer arithmetic — the only
    * doubles are one shared final chain, dist² = 2m(1 − (m·QT −
    * S_i·S_j) / (√(m·Q_i − S_i²)·√(m·Q_j − S_j²))), written in the
    * same IEEE order in both engines and rounded once.
    *
    * PLAN SHAPE = the SCAMP/SCRIMP parallelization: QT(i,j) along a
    * DIAGONAL d = i−j is a sliding sum of the product series
    * v_p·v_{p−d}, so the O(n²) work partitions by diagonal — each
    * diagonal is one independent windowed-sum task, which is exactly
    * how GPU/cluster matrix-profile engines shard. The corpus-sized
    * work is only the daily rollup (map-side combined); everything
    * after is series²-sized (n ≈ 2400 DAYS — fixed by the calendar,
    * not the corpus: at 100× the data the rollup grows and the
    * profile does not).
    */
  private val matrixProfile = QueryDef(
    "q_matrix_profile",
    "Exact matrix profile (window 16, exclusion 8) of the daily " +
      "revenue series: per window the z-normalized distance^2 to its " +
      "nearest non-trivial neighbor and that neighbor's index — " +
      "motifs at the minima, discords at the maxima. All window " +
      "sums/dots exact decimal; one shared IEEE chain at the end; " +
      "O(n^2) work partitioned by diagonal (the SCAMP sharding).",
    Some("""WITH dly AS (SELECT o_orderdate AS d,
           |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
           |              AS DECIMAL(12,0)) AS v
           |       FROM orders GROUP BY 1),
           |idx AS (SELECT CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i,
           |               v FROM dly),
           |w AS (SELECT i,
           |        CAST(sum(v) OVER win AS DECIMAL(14,0)) AS s,
           |        CAST(sum(CAST(v AS DECIMAL(25,0)) * v) OVER win
           |             AS DECIMAL(27,0)) AS q2,
           |        count(*) OVER win AS cnt
           |      FROM idx
           |      WINDOW win AS (ORDER BY i ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING)),
           |wv AS (SELECT i, s, q2 FROM w WHERE cnt = 16),
           |prod AS (SELECT a.i AS pi, b.i AS pj,
           |                CAST(a.v AS DECIMAL(25,0)) * b.v AS p
           |         FROM idx a, idx b),
           |qt AS (SELECT pi AS i, pj AS j,
           |         CAST(sum(p) OVER dwin AS DECIMAL(28,0)) AS qt,
           |         count(*) OVER dwin AS cnt
           |       FROM prod
           |       WINDOW dwin AS (PARTITION BY pi - pj ORDER BY pi
           |                       ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING)),
           |pairs AS (SELECT q.i, q.j, q.qt,
           |                 -- width >= 19 forces DuckDB's hugeint multiply
           |                 -- path (14x14 would clamp to DECIMAL(18) and
           |                 -- overflow on si*si)
           |                 CAST(wa.s AS DECIMAL(19,0)) AS si, wa.q2 AS qi,
           |                 CAST(wb.s AS DECIMAL(19,0)) AS sj, wb.q2 AS qj
           |          FROM qt q JOIN wv wa ON wa.i = q.i
           |                    JOIN wv wb ON wb.i = q.j
           |          WHERE q.cnt = 16 AND abs(q.i - q.j) >= 8),
           |dist AS (SELECT i, j,
           |    round(32e0 * (1e0 - CAST(16 * qt - si * sj AS DOUBLE)
           |      / (sqrt(CAST(16 * qi - si * si AS DOUBLE))
           |         * sqrt(CAST(16 * qj - sj * sj AS DOUBLE)))), 6) AS d2
           |  FROM pairs
           |  WHERE 16 * qi - si * si > 0 AND 16 * qj - sj * sj > 0),
           |prof AS (SELECT i, j, d2,
           |           row_number() OVER (PARTITION BY i ORDER BY d2, j) AS rk
           |         FROM dist)
           |SELECT i, CAST(j AS BIGINT) AS nn, d2 AS dist2
           |FROM prof WHERE rk = 1 ORDER BY i""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      // day index via the bucketed two-pass global sequence (the
      // q_enrich discipline — PlanSpec bans unpartitioned windows);
      // unix_date is the unique numeric key the scheme needs
      val daily = orders(s, d).groupBy(col("o_orderdate").as("d"))
        .agg((sum(money(col("o_totalprice"))) * 100)
          .cast(DecimalType(12, 0)).as("v"))
        .withColumn("dk", unix_date(col("d").cast("date")))
      val idx = graft.ops.Sequence.globalSequence(daily, "dk", "i")
        .select(lng(col("i")).as("i"), col("v"))
      graft.ops.MatrixProfile.profile(idx, m = 16, excl = 8)
    }
  )

  val defs: Seq[QueryDef] = Seq(skewReport, integrity, holt, changepoint,
    readability, snapshotDiff, filterFunnel, stl, ar1, binseg, matrixProfile)
}
