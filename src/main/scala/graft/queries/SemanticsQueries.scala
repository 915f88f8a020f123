package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Join/generator edge-semantics and time-series correlation operators
  * (SURVEY.md §2.24): null-safe equi join, outer explode, and rolling
  * correlation via a bounded range join.
  *
  * Determinism (SURVEY.md §7.5): exact integer aggregates everywhere;
  * the rolling Pearson r uses the shared q_corr co-moment chain; NULL
  * keys and NULL generator rows are part of the asserted semantics,
  * not an accident.
  *
  * Scale shapes (PLANS.md): the null-safe join touches only tiny
  * bucket aggregates; explode_outer is scan-stage work; the rolling
  * window is a ≤24× range self-join of the HOURLY aggregate — bounded
  * by the time range, not the data volume, so no unpartitioned window
  * is ever needed for a trailing frame.
  */
object SemanticsQueries {

  // ------------------------------------------------------------ nullsafe join

  private val joinNullsafe = QueryDef(
    "q_join_nullsafe",
    "Null-safe equi join (<=> ⇔ IS NOT DISTINCT FROM): click and " +
      "view events bucketed by a NULLABLE key (values below 5 " +
      "collapse to NULL — the 'unknown' bucket) and joined so that " +
      "NULL matches NULL — the semantics plain = silently drops. " +
      "Both sides are tiny per-bucket aggregates of one fact scan; " +
      "the join is a hash join on the null-safe key.",
    Some("""WITH a AS (SELECT CASE WHEN value < 5 THEN NULL
           |                       ELSE CAST(floor(value / 50) AS BIGINT) END AS nb,
           |                  count(*) AS n_click
           |           FROM events WHERE event_type = 'click' GROUP BY 1),
           |b AS (SELECT CASE WHEN value < 5 THEN NULL
           |                  ELSE CAST(floor(value / 50) AS BIGINT) END AS nb,
           |             count(*) AS n_view
           |      FROM events WHERE event_type = 'view' GROUP BY 1)
           |SELECT a.nb, CAST(a.n_click AS BIGINT) AS n_click,
           |       CAST(b.n_view AS BIGINT) AS n_view
           |FROM a JOIN b ON a.nb IS NOT DISTINCT FROM b.nb
           |ORDER BY a.nb""".stripMargin),
    (s, d) => {
      def side(t: String, out: String) = events(s, d)
        .filter(col("event_type") === t)
        .groupBy(when(col("value") < 5, lit(null))
          .otherwise(floor(col("value") / 50).cast("long")).as("nb"))
        .agg(count(lit(1)).as(out))
      val a = side("click", "n_click")
      val b = side("view", "n_view").withColumnRenamed("nb", "nb2")
      a.join(b, col("nb") <=> col("nb2"))
        .select(col("nb"), lng(col("n_click")).as("n_click"),
          lng(col("n_view")).as("n_view"))
        .orderBy("nb")
    }
  )

  // ------------------------------------------------------------ explode outer

  private val explodeOuter = QueryDef(
    "q_explode_outer",
    "Outer explode: each document's long tokens (length ≥ 7) as one " +
      "row each, KEEPING token-less documents as a NULL row — the " +
      "generator semantics that preserve row provenance (a plain " +
      "explode silently drops ~20% of the corpus here, which is how " +
      "joins against the output lose documents). Scan-stage filter + " +
      "explode_outer, zero shuffles before the output sort; the " +
      "oracle emulates with a CASE to [NULL] before unnest.",
    Some("""WITH ws AS (SELECT doc_id,
           |              list_filter(string_split(text, ' '), w -> length(w) >= 7) AS ws
           |            FROM documents)
           |SELECT doc_id,
           |       unnest(CASE WHEN len(ws) = 0 THEN [NULL] ELSE ws END) AS token
           |FROM ws ORDER BY doc_id, token""".stripMargin),
    (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          explode_outer(expr("filter(split(text, ' '), w -> length(w) >= 7)"))
            .as("token"))
        .orderBy("doc_id", "token")
  )

  // ---------------------------------------------------------------- roll corr

  private val rollCorr = QueryDef(
    "q_roll_corr",
    "Rolling 24-hour correlation between click and view hourly " +
      "volumes: for every hour with a full trailing day, Pearson r " +
      "over the 24 aligned (click, view) count pairs — the co-" +
      "movement monitor behind anomaly alerts. The trailing frame is " +
      "NOT a global-order window (banned shape): it is a range self-" +
      "join of the tiny hourly aggregate (≤24 matches per row, table " +
      "size bounded by the time range, not data volume), aggregated " +
      "per target hour with the exact-BIGINT co-moment chain of " +
      "q_corr.",
    Some("""WITH h AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |             count(*) FILTER (WHERE event_type = 'click') AS c,
           |             count(*) FILTER (WHERE event_type = 'view') AS v
           |           FROM events WHERE event_type IN ('click', 'view')
           |           GROUP BY 1),
           |p AS (SELECT t.hr, count(*) AS n, sum(s.c) AS sx, sum(s.v) AS sy,
           |        sum(s.c * s.v) AS sxy, sum(s.c * s.c) AS sxx, sum(s.v * s.v) AS syy
           |      FROM h t JOIN h s ON s.hr BETWEEN t.hr - 23 AND t.hr
           |      GROUP BY 1)
           |SELECT hr AS hour, CAST(n AS BIGINT) AS n_hours,
           |       CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN NULL
           |            ELSE round(CAST(n*sxy - sx*sy AS DOUBLE)
           |                       / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
           |                              * CAST(n*syy - sy*sy AS DOUBLE)), 6)
           |       END AS roll_r
           |FROM p WHERE n = 24 ORDER BY hour""".stripMargin),
    (s, d) => {
      val h = events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
        .agg(count(when(col("event_type") === "click", 1)).as("c"),
          count(when(col("event_type") === "view", 1)).as("v"))
      val p = h.as("t")
        .join(h.as("s"),
          col("s.hr") >= col("t.hr") - 23 && col("s.hr") <= col("t.hr"))
        .groupBy(col("t.hr").as("hour"))
        .agg(count(lit(1)).as("n"), sum(col("s.c")).as("sx"),
          sum(col("s.v")).as("sy"), sum(col("s.c") * col("s.v")).as("sxy"),
          sum(col("s.c") * col("s.c")).as("sxx"),
          sum(col("s.v") * col("s.v")).as("syy"))
      val d1 = col("n") * col("sxx") - col("sx") * col("sx")
      val d2 = col("n") * col("syy") - col("sy") * col("sy")
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      p.filter(col("n") === 24)
        .select(col("hour"), lng(col("n")).as("n_hours"),
          when(d1 === 0 || d2 === 0, lit(null))
            .otherwise(round(dbl(num) / sqrt(dbl(d1) * dbl(d2)), 6))
            .as("roll_r"))
        .orderBy("hour")
    }
  )

  // ------------------------------------------------------------ fill forward

  private val fillForward = QueryDef(
    "q_fill_forward",
    "Forward-fill imputation (LOCF): the hourly max purchase value " +
      "per event type on the FULL hour grid (q_gap_fill's grid " +
      "shape), with missing hours carrying the last observed value " +
      "forward via last_value(... IGNORE NULLS) over a type-" +
      "partitioned window — the imputation every feature backfill " +
      "runs; leading nulls before the first observation stay null. " +
      "Max of doubles is exact (no accumulation), the grid is " +
      "time-range-bounded, and the window partitions by type — " +
      "never global.",
    Some("""WITH e AS (SELECT event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
           |             value
           |           FROM events),
           |b AS (SELECT min(h) AS hmin, max(h) AS hmax FROM e),
           |hours AS (SELECT unnest(generate_series(hmin, hmax)) AS h FROM b),
           |types AS (SELECT DISTINCT event_type FROM e),
           |obs AS (SELECT event_type, h, max(value) AS v FROM e
           |        WHERE value >= 200 GROUP BY 1, 2),
           |grid AS (SELECT t.event_type, hs.h, obs.v
           |         FROM hours hs CROSS JOIN types t
           |         LEFT JOIN obs ON obs.h = hs.h AND obs.event_type = t.event_type)
           |SELECT event_type, h AS hour, round(v, 6) AS observed,
           |       round(last_value(v IGNORE NULLS) OVER (
           |         PARTITION BY event_type ORDER BY h
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS filled
           |FROM grid ORDER BY event_type, hour""".stripMargin),
    (s, d) => {
      val hExpr = "(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000"
      val e = events(s, d)
        .select(col("event_type"), expr(hExpr).as("h"), col("value"))
        .persist()
      val b = e.agg(min("h").as("hmin"), max("h").as("hmax"))
      val hours = b.select(explode(expr("sequence(hmin, hmax)")).as("h"))
      val types = e.select("event_type").distinct()
      val obs = e.filter(col("value") >= 200)
        .groupBy("event_type", "h").agg(max("value").as("v"))
      val grid = hours.crossJoin(broadcast(types))
        .join(obs, Seq("event_type", "h"), "left")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("h")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      grid.select(col("event_type"), col("h").as("hour"),
          round(col("v"), 6).as("observed"),
          round(last(col("v"), ignoreNulls = true).over(w), 6).as("filled"))
        .orderBy("event_type", "hour")
    }
  )

  // ------------------------------------------------------------ variant_json

  private val variantJson = QueryDef(
    "q_variant_json",
    "Semi-structured VARIANT fast path (Spark 4's parse-once binary " +
      "encoding — the engine-native alternative to q_json_fns' " +
      "per-path string re-parse): props parses ONCE into a variant, " +
      "then typed paths extract without re-tokenizing — variant_get " +
      "'$.k' as BIGINT, a nested '$.outer.k' through a constructed " +
      "object, try_variant_get on a MISSING path (NULL, no error), " +
      "and schema_of_variant pinning the inferred shape string. At " +
      "100 TB the variant columnar binary beats string JSON on every " +
      "repeated-path read (parse cost paid once at ingest, not per " +
      "query); this query pins the semantics that make the swap safe. " +
      "The oracle recomputes every extraction with DuckDB's JSON " +
      "paths (schema string stated as the Spark-spec'd constant).",
    Some("""WITH p AS (SELECT event_type,
           |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           |         CAST(json_extract_string('{"outer": ' || props || '}',
           |              '$.outer.k') AS BIGINT) AS outer_k
           |       FROM events)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(k) AS BIGINT) AS sum_k,
           |       CAST(min(k) AS BIGINT) AS min_k,
           |       CAST(max(k) AS BIGINT) AS max_k,
           |       CAST(sum(outer_k) AS BIGINT) AS sum_outer,
           |       CAST(count(*) AS BIGINT) AS n_missing_null,
           |       'OBJECT<k: BIGINT>' AS variant_schema
           |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => events(s, d)
      .withColumn("v", expr("parse_json(props)"))
      .withColumn("vo", expr("parse_json('{\"outer\": ' || props || '}')"))
      .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
      .withColumn("outer_k", expr("variant_get(vo, '$.outer.k', 'bigint')"))
      .withColumn("missing", expr("try_variant_get(v, '$.absent', 'bigint')"))
      .withColumn("vschema", expr("schema_of_variant(v)"))
      .groupBy("event_type")
      .agg(lng(count(lit(1))).as("n"), lng(sum(col("k"))).as("sum_k"),
        lng(min(col("k"))).as("min_k"), lng(max(col("k"))).as("max_k"),
        lng(sum(col("outer_k"))).as("sum_outer"),
        lng(count(when(col("missing").isNull, lit(1)))).as("n_missing_null"),
        min(col("vschema")).as("variant_schema"))
      .orderBy("event_type")
  )

  // -------------------------------------------------------------- collation

  private val collation = QueryDef(
    "q_collation",
    "Collation-aware grouping (Spark 4 collations): event types with " +
      "deterministically mixed case (UPPER on even event_ids) group " +
      "under UTF8_LCASE collation — the engine-native case-" +
      "insensitive GROUP BY that replaces the lower()-everywhere " +
      "rewrite (and keeps pushdown/statistics on the original " +
      "column). Per collated group: row count, how many raw-case " +
      "variants collapsed (exactly 2 per type by construction), and " +
      "a collated contains() probe ('ICK' matches 'click' only under " +
      "the case-insensitive comparison). Output keys come from " +
      "lower(min(raw)) — min under BINARY order, so the rendered key " +
      "is engine-deterministic even though the collated group " +
      "representative is not. The oracle is the lower()-rewrite the " +
      "feature replaces, proving semantic equivalence.",
    Some("""WITH mc AS (SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
           |                        ELSE event_type END AS m FROM events),
           |g AS (SELECT lower(m) AS key_lc, count(*) AS n,
           |             count(DISTINCT m) AS n_variants, min(m) AS sample
           |      FROM mc GROUP BY lower(m))
           |SELECT key_lc, CAST(n AS BIGINT) AS n,
           |       CAST(n_variants AS BIGINT) AS n_variants,
           |       contains(lower(sample), 'ick') AS has_ick
           |FROM g ORDER BY key_lc""".stripMargin),
    (s, d) => events(s, d)
      .select(when(col("event_id") % 2 === 0, upper(col("event_type")))
        .otherwise(col("event_type")).as("m"))
      // the grouping key IS the collated column — Catalyst groups by
      // the UTF8_LCASE sort key, not by a lower() projection
      .groupBy(expr("collate(m, 'UTF8_LCASE')").as("mkey"))
      .agg(lng(count(lit(1))).as("n"),
        lng(countDistinct(expr("collate(m, 'UTF8_BINARY')"))).as("n_variants"),
        min(expr("collate(m, 'UTF8_BINARY')")).as("sample"))
      .select(lower(col("sample")).as("key_lc"), col("n"), col("n_variants"),
        expr("contains(collate(sample, 'UTF8_LCASE'), 'ICK')").as("has_ick"))
      .orderBy("key_lc")
  )

  val defs: Seq[QueryDef] =
    Seq(joinNullsafe, explodeOuter, rollCorr, fillForward, variantJson,
      collation)
}
