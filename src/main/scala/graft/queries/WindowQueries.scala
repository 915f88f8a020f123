package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Window-function inventory (SURVEY.md §2.5): the reference's ±2-page
  * sliding window (app/main.py:76-82), plus ranking, frame aggregates
  * and lead/lag. All are one-shuffle plans keyed by the partition column
  * — the partition key (doc_id / user_id / customer) is what a 1000-
  * executor cluster parallelizes over, so no global sorts anywhere.
  */
object WindowQueries {

  /** Synthetic page size: documents.text is one string; the reference's
    * unit of windowing is a PDF page (app/main.py:19-27). Pages here are
    * fixed 120-char slices so both engines derive identical page sets.
    */
  private val PageLen = 120

  private val windowPages = QueryDef(
    "q_window_pages",
    "The reference's sliding page window (app/main.py:76-82): ±2-page " +
      "frame over page order, centered on odd pages (1-based, stride 2), " +
      "joined with '\\n\\n' (app/main.py:81). Order comes from the window " +
      "frame over page_no — never from implicit row order.",
    Some(s"""WITH pages AS (
            |  SELECT doc_id,
            |         unnest(generate_series(1, CAST(ceil(length(text) / $PageLen.0) AS INT))) AS page_no,
            |         unnest(list_transform(generate_series(1, CAST(ceil(length(text) / $PageLen.0) AS INT)),
            |                i -> substr(text, (i - 1) * $PageLen + 1, $PageLen))) AS page_text
            |  FROM documents),
            |ctx AS (
            |  SELECT doc_id, page_no,
            |         string_agg(page_text, chr(10) || chr(10))
            |           OVER (PARTITION BY doc_id ORDER BY page_no
            |                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS window_text
            |  FROM pages)
            |SELECT doc_id, CAST(page_no AS BIGINT) AS page_no, window_text,
            |       CAST(length(window_text) AS BIGINT) AS window_len
            |FROM ctx WHERE page_no % 2 = 1
            |ORDER BY doc_id, page_no""".stripMargin),
    (s, d) => {
      val pages = documents(s, d)
        .select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(1, CAST(ceil(length(text) / $PageLen.0) AS INT)), i -> substring(text, (i - 1) * $PageLen + 1, $PageLen))"))
            .as(Seq("p0", "page_text")))
        .select(col("doc_id"), (col("p0") + 1).as("page_no"), col("page_text"))
      val w = Window.partitionBy("doc_id").orderBy("page_no").rowsBetween(-2, 2)
      pages
        .withColumn("window_text", array_join(collect_list(col("page_text")).over(w), "\n\n"))
        .filter(col("page_no") % 2 === 1)
        .select(col("doc_id"), lng(col("page_no")).as("page_no"),
          col("window_text"), lng(length(col("window_text"))).as("window_len"))
        .orderBy("doc_id", "page_no")
    }
  )

  private val windowRank = QueryDef(
    "q_window_rank",
    "Ranking: top-3 orders per customer by totalprice (row_number with " +
      "explicit tiebreak).",
    Some("""SELECT o_custkey, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice
           |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
           |             row_number() OVER (PARTITION BY o_custkey
           |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           |      FROM orders) t
           |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
    (s, d) => orders(s, d)
      .withColumn("rn", lng(row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey")))))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  )

  private val windowFrame = QueryDef(
    "q_window_frame",
    "Analytic frame aggregates per user: running total and 5-row moving " +
      "average over event time. Sums in exact decimal so frame-evaluation " +
      "order (sequential in Spark, segment-tree in DuckDB) cannot change " +
      "the result.",
    Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           |                  CAST(value AS DECIMAL(18,2)) AS v FROM events)
           |SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           |  CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           |  round(CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) /
           |        count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS moving_avg
           |FROM e ORDER BY user_id, ts_us, event_id""".stripMargin),
    (s, d) => {
      val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wMov = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
      events(s, d)
        .withColumn("v", money(col("value")))
        .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("ts_us"),
          dbl(sum(col("v")).over(wRun)).as("running_total"),
          round(dbl(sum(col("v")).over(wMov)) / count(lit(1)).over(wMov), 6).as("moving_avg"))
        .orderBy("user_id", "ts_us", "event_id")
    }
  )

  private val windowLeadLag = QueryDef(
    "q_window_lead_lag",
    "lag/lead per user: inter-event gap in µs and the next event type.",
    Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           |                  event_type FROM events)
           |SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER
           |         (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           |       lead(event_type, 1) OVER
           |         (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
           |FROM e ORDER BY user_id, ts_us, event_id""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .withColumn("ts_us", epochUs(col("ts")))
        .select(col("user_id"), col("event_id"), col("ts_us"),
          (col("ts_us") - lag(col("ts_us"), 1).over(w)).as("gap_us"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .orderBy("user_id", "ts_us", "event_id")
    }
  )

  private val windowDist = QueryDef(
    "q_window_dist",
    "Distribution window functions over orders: ntile(4) quartile, " +
      "percent_rank, cume_dist per priority class — ordered by a unique " +
      "(totalprice, orderkey) key so ntile's row numbering is " +
      "deterministic under ties.",
    Some("""SELECT o_orderkey, o_orderpriority,
           |       CAST(ntile(4) OVER w AS INT) AS quartile,
           |       round(percent_rank() OVER w, 6) AS pct_rank,
           |       round(cume_dist() OVER w, 6) AS cdist
           |FROM orders
           |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
           |ORDER BY o_orderkey""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
      orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("o_orderkey")
    }
  )

  private val windowNth = QueryDef(
    "q_window_nth",
    "Window-function completion: dense_rank over a COARSE tie-heavy " +
      "key (thousand-dollar balance buckets — dense ranking depends " +
      "only on the key value, so ties cannot make it " +
      "order-sensitive) plus nth_value(3) over the full partition " +
      "frame under a TOTAL order (balance desc, custkey — nth_value " +
      "is frame-order-sensitive, so the order must be total to be " +
      "deterministic): every customer annotated with its nation's " +
      "third-highest account balance. Both windows partition by " +
      "nation; no global sort.",
    Some("""SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nation,
           |       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
           |       CAST(dense_rank() OVER (PARTITION BY c_nationkey
           |         ORDER BY CAST(floor(c_acctbal / 1000) AS BIGINT) DESC) AS BIGINT) AS bucket_rank,
           |       round(nth_value(c_acctbal, 3) OVER (PARTITION BY c_nationkey
           |         ORDER BY c_acctbal DESC, c_custkey
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS third_bal
           |FROM customer ORDER BY c_custkey""".stripMargin),
    (s, d) => {
      val bucket = floor(col("c_acctbal") / 1000).cast("long")
      val wDense = Window.partitionBy("c_nationkey").orderBy(bucket.desc)
      val wNth = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      customer(s, d).select(
          col("c_custkey"), lng(col("c_nationkey")).as("nation"),
          bucket.as("bal_bucket"),
          lng(dense_rank().over(wDense)).as("bucket_rank"),
          round(nth_value(col("c_acctbal"), 3).over(wNth), 2).as("third_bal"))
        .orderBy("c_custkey")
    }
  )

  private val windowRange = QueryDef(
    "q_window_range",
    "Time-based RANGE window frame: per-user trailing 1-hour sum and " +
      "count over events, ordered by the integer epoch-µs timestamp " +
      "(RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW). Distinct " +
      "from the ROWS frames elsewhere in §2.5: the frame is bounded by " +
      "VALUE distance, so bursty users aggregate many rows and sparse " +
      "users few — the rolling-metrics shape monitoring pipelines need. " +
      "One shuffle on user_id; each partition sorts locally by ts. Sums " +
      "go through exact DECIMAL so accumulation order cannot matter.",
    Some("""WITH e AS (SELECT event_id, user_id,
           |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events)
           |SELECT event_id, user_id, us,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h,
           |  CAST(count(*) OVER w AS BIGINT) AS n_1h
           |FROM e
           |WINDOW w AS (PARTITION BY user_id ORDER BY us
           |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
           |ORDER BY user_id, us""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-3600000000L, 0L)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("us"), col("value"))
        .select(col("event_id"), col("user_id"), col("us"),
          dbl(sum(money(col("value"))).over(w)).as("sum_1h"),
          lng(count(lit(1)).over(w)).as("n_1h"))
        .orderBy("user_id", "us")
    }
  )

  val defs: Seq[QueryDef] = Seq(windowPages, windowRank, windowFrame,
    windowLeadLag, windowDist, windowNth, windowRange)
}
