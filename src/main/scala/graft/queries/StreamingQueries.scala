package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.streaming.StreamingOps
import graft.util.Det._

/** Batch twins of the streaming inventory (SURVEY.md §2.9).
  *
  * Streaming queries cannot be DuckDB-checked as streams, so each
  * operator is validated two ways: (1) the *identical builder* from
  * graft.streaming.StreamingOps run here in batch mode against the
  * DuckDB oracle, and (2) MemoryStream scalatest suites
  * (StreamingSpec) proving the same builder produces the same result
  * incrementally with watermarks.
  */
object StreamingQueries {

  private val HourUs = 3600000000L
  private val HalfHourUs = 1800000000L

  private val streamTumbling = QueryDef(
    "q_stream_tumbling",
    "Tumbling 1h event-time window counts per event type (stream twin: " +
      "withWatermark('ts', '10 minutes') + the same builder).",
    Some(s"""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS e_us, event_type,
            |                 CAST(value AS DECIMAL(18,2)) AS v FROM events)
            |SELECT (e_us // $HourUs) * $HourUs AS ws_us,
            |       (e_us // $HourUs) * $HourUs + $HourUs AS we_us,
            |       event_type, count(*) AS n,
            |       CAST(sum(v) AS DOUBLE) AS sum_value
            |FROM e GROUP BY 1, 2, 3 ORDER BY ws_us, event_type""".stripMargin),
    (s, d) => StreamingOps.windowToEpoch(
      StreamingOps.tumbling(events(s, d)), col("event_type"))
      .orderBy("ws_us", "event_type")
  )

  private val streamSliding = QueryDef(
    "q_stream_sliding",
    "Sliding 1h/30m event-time windows (every event in exactly two " +
      "windows) per event type.",
    Some(s"""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS e_us, event_type,
            |                 CAST(value AS DECIMAL(18,2)) AS v FROM events),
            |x AS (SELECT unnest([(e_us // $HalfHourUs) * $HalfHourUs,
            |                     (e_us // $HalfHourUs) * $HalfHourUs - $HalfHourUs]) AS ws_us,
            |             e_us, event_type, v
            |      FROM e)
            |SELECT ws_us, ws_us + $HourUs AS we_us, event_type, count(*) AS n,
            |       CAST(sum(v) AS DOUBLE) AS sum_value
            |FROM x GROUP BY 1, 2, 3 ORDER BY ws_us, event_type""".stripMargin),
    (s, d) => StreamingOps.windowToEpoch(
      StreamingOps.sliding(events(s, d)), col("event_type"))
      .orderBy("ws_us", "event_type")
  )

  private val streamSession = QueryDef(
    "q_stream_session",
    "Session windows per user, 30m inactivity gap (session end = last " +
      "event + gap, Spark semantics). Oracle twin: gaps-and-islands.",
    Some(s"""WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_us,
            |                  CAST(value AS DECIMAL(18,2)) AS v FROM events),
            |flagged AS (
            |  SELECT *, CASE WHEN e_us - lag(e_us) OVER
            |                   (PARTITION BY user_id ORDER BY e_us, event_id) < $HalfHourUs
            |                 THEN 0 ELSE 1 END AS new_session
            |  FROM e),
            |sess AS (
            |  SELECT *, sum(new_session) OVER
            |              (PARTITION BY user_id ORDER BY e_us, event_id
            |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
            |  FROM flagged)
            |SELECT user_id, min(e_us) AS ws_us, max(e_us) + $HalfHourUs AS we_us,
            |       count(*) AS n, CAST(sum(v) AS DOUBLE) AS sum_value
            |FROM sess GROUP BY user_id, sid ORDER BY user_id, ws_us""".stripMargin),
    (s, d) => StreamingOps.windowToEpoch(
      StreamingOps.sessions(events(s, d)), col("user_id"))
      .select("user_id", "ws_us", "we_us", "n", "sum_value")
      .orderBy("user_id", "ws_us")
  )

  private val streamDedup = QueryDef(
    "q_stream_dedup",
    "Exactly-once restore over an at-least-once source: every 7th " +
      "event is redelivered (union twin of a replaying source) and " +
      "the stream dedup builder drops the duplicates by event_id. " +
      "Same builder as the streaming path (StreamingSpec); the " +
      "bounded-state variant dropDuplicatesWithinWatermark is proven " +
      "in DedupBoundedSpec — state eviction has no batch twin.",
    Some("""WITH src AS (
           |  SELECT * FROM events
           |  UNION ALL SELECT * FROM events WHERE event_id % 7 = 0)
           |SELECT DISTINCT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS e_us,
           |       user_id, event_type, value
           |FROM src ORDER BY event_id""".stripMargin),
    (s, d) => {
      val e = events(s, d)
      // duplicates are full-row identical, so dropDuplicates' arbitrary
      // pick-one-per-key is still deterministic in content
      StreamingOps.dedup(e.unionAll(e.filter(col("event_id") % 7 === 0)))
        .select(col("event_id"), unix_micros(col("ts")).as("e_us"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }
  )

  private val streamJoin = QueryDef(
    "q_stream_join",
    "Stream-stream interval join batch twin: purchases joined to the " +
      "same user's clicks within the preceding 30 minutes — the " +
      "watermark-bounded-state shape (both sides watermarked, time " +
      "range in the join condition) proven incrementally in " +
      "StreamingSpec. Batch plan: one user_id-partitioned join with a " +
      "residual time-range predicate.",
    Some("""WITH c AS (SELECT user_id, event_id,
           |                  epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
           |           FROM events WHERE event_type = 'click'),
           |p AS (SELECT user_id, event_id,
           |             epoch_us(CAST(ts AS TIMESTAMP)) AS e_us
           |      FROM events WHERE event_type = 'purchase')
           |SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
           |       p.e_us AS p_us, c.e_us AS c_us
           |FROM p JOIN c ON c.user_id = p.user_id
           |               AND c.e_us >= p.e_us - 1800000000
           |               AND c.e_us <= p.e_us
           |ORDER BY purchase_id, click_id""".stripMargin),
    (s, d) => {
      val e = events(s, d)
      StreamingOps.clickToPurchase(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "purchase"))
        .orderBy("purchase_id", "click_id")
    }
  )

  private val streamTopK = QueryDef(
    "q_stream_topk",
    "Per-window top-3 events by value batch twin: tumbling 1h windows " +
      "reduced through the partial-aggregating TopKByScore Aggregator " +
      "— per open window the streaming state is k buffer rows, never " +
      "the window's events (a window row_number would buffer them " +
      "all); (value DESC, event_id ASC) tiebreak; incremental " +
      "equivalence proven in StreamingSpec.",
    Some(s"""WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS e_us,
            |                  event_id, event_type, value FROM events),
            |r AS (SELECT (e_us // $HourUs) * $HourUs AS ws_us,
            |             (e_us // $HourUs) * $HourUs + $HourUs AS we_us,
            |             event_id, event_type, value,
            |             row_number() OVER (PARTITION BY e_us // $HourUs
            |                                ORDER BY value DESC, event_id) AS rank
            |      FROM e)
            |SELECT ws_us, we_us, CAST(rank AS BIGINT) AS rank,
            |       event_id, event_type, value
            |FROM r WHERE rank <= 3 ORDER BY ws_us, rank""".stripMargin),
    (s, d) => StreamingOps.topKToRows(
      StreamingOps.windowedTopK(events(s, d)))
      .orderBy("ws_us", "rank")
  )

  /** Watermark sizing audit — the batch measurement every streaming
    * deployment runs on its lake BEFORE picking withWatermark's
    * threshold (too tight drops data, too loose bloats state; the
    * number you need is the observed lateness distribution under the
    * real arrival order). Arrival is simulated with a deterministic
    * per-event transport delay (hash-jitter ≤ 996 s — the Knuth
    * multiplicative constant the LSH keys already use); the watermark
    * is the streaming-standard high-water mark max(event_ts seen so
    * far) − 600 s per KEY (user), matching keyed-state semantics
    * where transformWithState tracks per-key progress. A row is LATE
    * if its event time is behind its key's watermark at arrival.
    *
    * Determinism: everything is exact BIGINT microsecond arithmetic —
    * the delay, the prefix max, the 600 s threshold, the floor-div
    * lateness seconds; late_pct is the single final division. The
    * window partitions by user (no unpartitioned window), ordered by
    * (arrival, event_id).
    *
    * Scale: per-key prefix max = one keyed window pass (state O(1)
    * per key in the streaming twin); output is users-sized.
    */
  private val watermarkAudit = QueryDef(
    "q_watermark_audit",
    "Watermark sizing audit: per-user high-water-mark lateness under " +
      "a deterministic hash-jittered arrival order and a 600 s " +
      "watermark — late counts, rate, and worst lateness seconds, " +
      "the readout that sizes withWatermark before deployment.",
    Some("""WITH e AS (SELECT user_id, event_id,
           |                  epoch_us(CAST(ts AS TIMESTAMP)) AS e_us,
           |                  epoch_us(CAST(ts AS TIMESTAMP))
           |                    + (((event_id % 997) * 2654435761) % 997) * 1000000 AS arr_us
           |           FROM events),
           |w AS (SELECT user_id, event_id, e_us,
           |             max(e_us) OVER (PARTITION BY user_id ORDER BY arr_us, event_id
           |                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
           |      FROM e),
           |l AS (SELECT user_id, e_us, hwm,
           |             (hwm IS NOT NULL AND e_us < hwm - 600000000) AS late,
           |             CASE WHEN hwm IS NOT NULL AND e_us < hwm - 600000000
           |                  THEN (hwm - 600000000 - e_us) // 1000000 ELSE 0 END AS late_s
           |      FROM w)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           |       round(CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS late_pct,
           |       CAST(max(late_s) AS BIGINT) AS max_late_s
           |FROM l GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, d).select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("e_us"))
        // id reduced mod 997 BEFORE the Knuth multiply (ADVICE r12):
        // (id·k) mod 997 ≡ ((id mod 997)·k) mod 997, so the jitter is
        // value-identical at every scale, but the product now tops out
        // at 996·k ≈ 2.6e12 — no BIGINT wrap at any event_id
        .withColumn("arr_us",
          col("e_us")
            + (((col("event_id") % 997) * 2654435761L) % 997) * 1000000L)
      val w = Window.partitionBy("user_id").orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val late = col("hwm").isNotNull && col("e_us") < col("hwm") - 600000000L
      e.withColumn("hwm", max(col("e_us")).over(w))
        .select(col("user_id"), late.as("late"),
          when(late, expr("(hwm - 600000000 - e_us) div 1000000"))
            .otherwise(lit(0L)).as("late_s"))
        .groupBy("user_id")
        .agg(lng(count(lit(1))).as("n"),
          lng(sum(when(col("late"), 1L).otherwise(0L))).as("n_late"),
          round(dbl(sum(when(col("late"), 1L).otherwise(0L))) / count(lit(1)), 6)
            .as("late_pct"),
          lng(max(col("late_s"))).as("max_late_s"))
        .orderBy("user_id")
    }
  )

  val defs: Seq[QueryDef] = Seq(streamTumbling, streamSliding, streamSession, streamTopK,
    streamDedup, streamJoin, watermarkAudit)
}
