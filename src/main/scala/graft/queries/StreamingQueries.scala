package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.streaming.StreamingOps

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

  val defs: Seq[QueryDef] = Seq(streamTumbling, streamSliding, streamSession, streamTopK,
    streamDedup, streamJoin)
}
