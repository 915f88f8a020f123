package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Ordered-event-flow operators over the `events` stream table:
  * sequence-pattern detection (the MATCH_RECOGNIZE shape) and
  * last-touch revenue attribution.
  *
  * Both are single-sort shapes: one window partitioned by `user_id`
  * (high cardinality — parallelism grows with the data) carries ALL
  * the per-user sequence state as running conditional extremes; there
  * is no self-join, no per-row subquery, no pattern automaton outside
  * the window frame. That is the only shape that survives a 100 TB
  * event log: each user's history is sorted once, within its own
  * partition, and every pattern/attribution answer falls out of the
  * same pass.
  *
  * Determinism (SURVEY.md §7.5): event order is (us, event_id) — the
  * event_id tiebreak makes same-microsecond events totally ordered in
  * both engines; attribution state is a zero-padded sortable string
  * key (max() of it is the latest touch), so no engine-specific
  * `last_value` / `arg_max` semantics are relied on.
  */
object EventFlowQueries {

  private def eventsUs(s: org.apache.spark.sql.SparkSession, d: String) =
    events(s, d).select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), unix_micros(col("ts")).as("us"))

  // ------------------------------------------------------------ seq pattern

  private val seqPattern = QueryDef(
    "q_seq_pattern",
    "Sequence-pattern detection (MATCH_RECOGNIZE shape): per user, " +
      "purchases that complete a click → view → purchase pattern — a " +
      "click precedes the purchase within 1 hour, and a view falls " +
      "strictly between that click and the purchase. One window per " +
      "user carries the pattern state as running conditional maxima " +
      "(last click µs, last view µs); a purchase row matches iff " +
      "last_view > last_click and purchase − last_click ≤ 1h. No self-" +
      "joins, no automaton: the funnel-with-ordering query as a single " +
      "sorted pass, the way a 100 TB event log has to run it.",
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
           |s AS (SELECT user_id, event_type, us,
           |        max(CASE WHEN event_type = 'click' THEN us END)
           |          OVER (PARTITION BY user_id ORDER BY us, event_id
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click,
           |        max(CASE WHEN event_type = 'view' THEN us END)
           |          OVER (PARTITION BY user_id ORDER BY us, event_id
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
           |      FROM e)
           |SELECT user_id,
           |       CAST(count(*) AS BIGINT) AS n_purchases,
           |       CAST(count(*) FILTER (WHERE last_click IS NOT NULL
           |                               AND last_view > last_click
           |                               AND us - last_click <= 3600000000) AS BIGINT) AS n_pattern
           |FROM s WHERE event_type = 'purchase'
           |GROUP BY user_id ORDER BY user_id""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val st = eventsUs(s, d)
        .withColumn("last_click",
          max(when(col("event_type") === "click", col("us"))).over(w))
        .withColumn("last_view",
          max(when(col("event_type") === "view", col("us"))).over(w))
        .filter(col("event_type") === "purchase")
      val matched = col("last_click").isNotNull &&
        col("last_view") > col("last_click") &&
        col("us") - col("last_click") <= 3600000000L
      st.groupBy("user_id")
        .agg(lng(count(lit(1))).as("n_purchases"),
          lng(count(when(matched, 1))).as("n_pattern"))
        .orderBy("user_id")
    }
  )

  // ------------------------------------------------------------ attribution

  private val attribution = QueryDef(
    "q_attribution",
    "Last-touch revenue attribution: each purchase's value is " +
      "credited to the latest preceding touch event (click / view / " +
      "signup) by the same user; purchases with no prior touch fall " +
      "into '(none)'. The latest touch rides the same per-user window " +
      "as q_seq_pattern, encoded as a zero-padded (us, event_id, type) " +
      "string whose running max IS the latest touch — portable across " +
      "engines where last_value/arg_max window semantics are not. " +
      "Credited value sums as exact DECIMAL. Output: per touch type, " +
      "attributed purchase count and revenue — the marketing-" +
      "attribution shape, one sorted pass over the log.",
    Some("""WITH e AS (SELECT user_id, event_id, event_type, value,
           |             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
           |s AS (SELECT user_id, event_type, value,
           |        max(CASE WHEN event_type IN ('click','view','signup')
           |                 THEN lpad(CAST(us AS VARCHAR), 20, '0')
           |                      || lpad(CAST(event_id AS VARCHAR), 12, '0')
           |                      || event_type END)
           |          OVER (PARTITION BY user_id ORDER BY us, event_id
           |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_key
           |      FROM e)
           |SELECT coalesce(substr(touch_key, 33), '(none)') AS touch_type,
           |       CAST(count(*) AS BIGINT) AS n_purchases,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM s WHERE event_type = 'purchase'
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val key = concat(
        lpad(col("us").cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 12, "0"),
        col("event_type"))
      val st = eventsUs(s, d)
        .withColumn("touch_key",
          max(when(col("event_type").isin("click", "view", "signup"), key))
            .over(w))
        .filter(col("event_type") === "purchase")
      st.select(
          coalesce(substring(col("touch_key"), 33, 10), lit("(none)"))
            .as("touch_type"),
          col("value"))
        .groupBy("touch_type")
        .agg(lng(count(lit(1))).as("n_purchases"),
          sumMoney(col("value")).as("revenue"))
        .orderBy("touch_type")
    }
  )

  val defs: Seq[QueryDef] = Seq(seqPattern, attribution)
}
