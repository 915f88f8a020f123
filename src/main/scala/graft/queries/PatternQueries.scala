package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Classic SQL/pipeline patterns as first-class operators (SURVEY.md
  * §2.23): schema-drift-tolerant union, per-group mode, gaps-and-
  * islands streaks, keep-best dedup survivor selection, and ordered
  * string aggregation.
  *
  * Determinism (SURVEY.md §7.5): everything here is exact integer /
  * string work; every arg-max has a total-order tiebreak; ordered
  * concatenation uses an explicit ORDER BY key in both engines.
  *
  * Scale shapes (PLANS.md): the mode and survivor arg-maxes are
  * per-key top-1 windows that compile to WindowGroupLimit; streak
  * detection is two partitioned windows over per-(customer, day)
  * aggregates; the drift union is pure per-row scan work.
  */
object PatternQueries {

  // ------------------------------------------------------------ union evolve

  private val unionEvolve = QueryDef(
    "q_union_evolve",
    "Schema-drift-tolerant union: an old-schema slice (doc_id, " +
      "source, n_chars) and a new-schema slice (doc_id, source, lang, " +
      "quality flag) combine by COLUMN NAME with nulls for the " +
      "columns each side lacks (unionByName(allowMissingColumns) ⇔ " +
      "UNION ALL BY NAME) — the append that keeps working when a " +
      "producer adds fields. Pure scan-stage work: two projections of " +
      "the same table, zero shuffles before the output sort.",
    Some("""SELECT * FROM (
           |  SELECT doc_id, source, n_chars FROM documents WHERE doc_id % 2 = 0
           |  UNION ALL BY NAME
           |  SELECT doc_id, source, lang, (n_chars >= 600) AS long_doc
           |  FROM documents WHERE doc_id % 2 = 1)
           |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val doc = documents(s, d)
      val old = doc.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val neu = doc.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("source"), col("lang"),
          (col("n_chars") >= 600).as("long_doc"))
      old.unionByName(neu, allowMissingColumns = true)
        .orderBy("doc_id")
    }
  )

  // ------------------------------------------------------------------- mode

  private val mode = QueryDef(
    "q_mode",
    "Per-group mode (most frequent value): each user cohort's " +
      "dominant event type with its count and share — the categorical " +
      "summary statistic GROUP BY can't express directly. Count " +
      "aggregation to ≤ cohorts×types cells, then a per-cohort top-1 " +
      "window with (count desc, value) total order — compiles to " +
      "WindowGroupLimit, so only per-cohort candidates cross the " +
      "exchange; the share is one double division.",
    Some("""WITH c AS (SELECT user_id % 10 AS cohort, event_type, count(*) AS n
           |           FROM events GROUP BY 1, 2),
           |t AS (SELECT cohort, sum(n) AS tot FROM c GROUP BY 1),
           |rk AS (SELECT c.cohort, c.event_type, c.n, t.tot,
           |         row_number() OVER (PARTITION BY c.cohort ORDER BY c.n DESC, c.event_type) AS rn
           |       FROM c JOIN t USING (cohort))
           |SELECT CAST(cohort AS BIGINT) AS cohort, event_type AS mode_value,
           |       CAST(n AS BIGINT) AS n,
           |       round(CAST(n AS DOUBLE) / tot, 6) AS share
           |FROM rk WHERE rn = 1 ORDER BY cohort""".stripMargin),
    (s, d) => {
      val c = events(s, d)
        .groupBy((col("user_id") % 10).as("cohort"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy("cohort").agg(sum("n").as("tot"))
      val w = Window.partitionBy("cohort")
        .orderBy(col("n").desc, col("event_type"))
      c.join(broadcast(t), "cohort")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(lng(col("cohort")).as("cohort"),
          col("event_type").as("mode_value"), lng(col("n")).as("n"),
          round(dbl(col("n")) / col("tot"), 6).as("share"))
        .orderBy("cohort")
    }
  )

  // ----------------------------------------------------------------- streaks

  private val streaks = QueryDef(
    "q_streaks",
    "Gaps-and-islands: each customer's longest streak of consecutive " +
      "order DAYS (day − row_number is constant within an island — " +
      "the classic trick, all exact integers). Two windows, both " +
      "partitioned by customer over the per-(customer, day) " +
      "aggregate: row_number to stamp the island key, then a plain " +
      "count per island; the top-100 longest streaks with total-order " +
      "tiebreak compile to TakeOrderedAndProject. At 100 TB the fact " +
      "collapses to distinct days per key before any window runs.",
    Some("""WITH days AS (SELECT DISTINCT o_custkey,
           |                epoch_us(o_orderdate) // 86400000000 AS day
           |              FROM orders),
           |isl AS (SELECT o_custkey, day,
           |          day - row_number() OVER (PARTITION BY o_custkey ORDER BY day) AS isl
           |        FROM days),
           |st AS (SELECT o_custkey, isl, count(*) AS len,
           |         min(day) AS start_day
           |       FROM isl GROUP BY 1, 2)
           |SELECT o_custkey, CAST(len AS BIGINT) AS streak_days,
           |       strftime(make_timestamp(start_day * 86400000000), '%Y-%m-%d') AS start_date
           |FROM st ORDER BY len DESC, o_custkey, start_day LIMIT 100""".stripMargin),
    (s, d) => {
      val dayExpr = "(unix_micros(CAST(o_orderdate AS TIMESTAMP)) - " +
        "pmod(unix_micros(CAST(o_orderdate AS TIMESTAMP)), 86400000000)) DIV 86400000000"
      val days = orders(s, d)
        .select(col("o_custkey"), expr(dayExpr).as("day"))
        .distinct()
      val w = Window.partitionBy("o_custkey").orderBy("day")
      val isl = days.withColumn("isl", col("day") - row_number().over(w))
      isl.groupBy("o_custkey", "isl")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
        .select(col("o_custkey"), lng(col("len")).as("streak_days"),
          dateStr(timestamp_micros(col("start_day") * 86400000000L))
            .as("start_date"),
          col("len"), col("start_day"))
        .orderBy(col("len").desc, col("o_custkey"), col("start_day"))
        .select("o_custkey", "streak_days", "start_date")
        .limit(100)
    }
  )

  // ---------------------------------------------------------- dedup survivor

  private val dedupSurvivor = QueryDef(
    "q_dedup_survivor",
    "Keep-best dedup (survivor selection): documents grouped by " +
      "normalized text fingerprint (lower, collapsed whitespace, " +
      "md5); within each duplicate group the SURVIVOR is the longest " +
      "document (doc_id tiebreak) — corpus dedup that keeps the best " +
      "copy instead of an arbitrary one, reporting each survivor " +
      "with its group size. Per-group top-1 window with total order " +
      "→ WindowGroupLimit: only per-fingerprint candidates shuffle, " +
      "the document payload rides once.",
    Some("""WITH f AS (SELECT doc_id, source, n_chars,
           |             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
           |           FROM documents),
           |rk AS (SELECT doc_id, source, n_chars, fp,
           |         count(*) OVER (PARTITION BY fp) AS group_size,
           |         row_number() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id) AS rn
           |       FROM f)
           |SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           |       CAST(group_size AS BIGINT) AS group_size
           |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val f = documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
      val wAll = Window.partitionBy("fp")
      val wRk = Window.partitionBy("fp")
        .orderBy(col("n_chars").desc, col("doc_id"))
      f.withColumn("group_size", count(lit(1)).over(wAll))
        .withColumn("rn", row_number().over(wRk))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("source"), lng(col("n_chars")).as("n_chars"),
          lng(col("group_size")).as("group_size"))
        .orderBy("doc_id")
    }
  )

  // -------------------------------------------------------------- string agg

  private val stringAgg = QueryDef(
    "q_string_agg",
    "Ordered string aggregation (LISTAGG): per region, its nations " +
      "as one comma-joined alphabetical string plus the count — the " +
      "denormalized-label assembly every report sink wants. Spark " +
      "has no ordered string_agg aggregate, so the list collects and " +
      "sorts per group (bounded: nations per region) and joins once " +
      "— the same ordered-fold discipline as q_sax; the oracle uses " +
      "DuckDB's native string_agg ORDER BY.",
    Some("""SELECT r.r_name AS region,
           |       CAST(count(*) AS BIGINT) AS n_nations,
           |       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
           |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) =>
      nation(s, d)
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(lng(count(lit(1))).as("n_nations"),
          array_join(sort_array(collect_list(col("n_name"))), ",")
            .as("nations"))
        .orderBy("region")
  )

  val defs: Seq[QueryDef] = Seq(unionEvolve, mode, streaks, dedupSurvivor,
    stringAgg)
}
