package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Det._

/** Structured-Streaming operators (SURVEY.md §2.9) and their batch
  * twins.
  *
  * Each builder takes *any* events-shaped DataFrame — batch or
  * streaming — and returns the same logical aggregation, so the graded
  * batch-twin queries and the MemoryStream scalatest suites run the
  * identical code path. Streaming callers add `withWatermark` before
  * the builder (watermarks are mandatory on every stateful op at scale:
  * they bound state store size; SURVEY.md §7.4 item 5).
  *
  * The reference's only streaming-ish behavior — per-record append +
  * flush (app/main.py:99,110-111) — maps to `appendJsonSink`, which
  * upgrades at-least-once flushing to checkpointed exactly-once.
  */
object StreamingOps {

  /** Tumbling 1h event-time window counts per event type. */
  def tumbling(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))

  /** Sliding 1h window, 30m slide: every event lands in exactly two
    * windows.
    */
  def sliding(events: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))

  /** Session windows per user with a 30m inactivity gap. Session end =
    * last event + gap (Spark semantics).
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))

  /** Streaming dedup by event_id — exact, but state grows FOREVER:
    * with only the id in the key set, the watermark never expires
    * dedup state. Correct for bounded backfills; for unbounded streams
    * use [[dedupBounded]].
    */
  def dedup(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Streaming dedup with state EVICTED by the watermark
    * (`dropDuplicatesWithinWatermark`): duplicates arriving within the
    * watermark delay of the first occurrence are dropped, and an id's
    * state is freed once the watermark passes it — bounded state on an
    * unbounded stream, the only dedup shape that survives 100 TB/day.
    * Input must carry `withWatermark` on its event-time column.
    */
  def dedupBounded(events: DataFrame): DataFrame =
    events.dropDuplicatesWithinWatermark("event_id")

  /** Per-window top-k events by value ("top transactions this hour")
    * — the stateful RANKED readout the plain windowed aggregations
    * cannot give. Built on the partial-aggregating TopKByScore
    * Aggregator, which is the property that makes this streamable at
    * scale: per open window the state store holds k rows (the
    * aggregation buffer), never the window's events — a window
    * row_number would need every event buffered. Deterministic
    * (value DESC, event_id ASC) tiebreak, same as every ranked query
    * in the inventory. Works identically on batch frames (the graded
    * batch twin).
    */
  def windowedTopK(events: DataFrame, k: Int = 3,
                   width: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"))
      .agg(graft.functions.TopKByScore.topK(k)(
        col("event_id"), col("event_type"), col("value")).as("top"))

  /** Project a [[windowedTopK]] result to the deterministic flat shape
    * the oracle compares (one row per ranked event).
    */
  def topKToRows(df: DataFrame): DataFrame =
    df.select(epochUs(col("w.start")).as("ws_us"),
        epochUs(col("w.end")).as("we_us"),
        posexplode(col("top")).as(Seq("i", "c")))
      .select(col("ws_us"), col("we_us"), lng(col("i") + 1).as("rank"),
        col("c.cand_id").as("event_id"), col("c.label").as("event_type"),
        col("c.score").as("value"))

  /** Project a windowed result to the deterministic epoch-µs shape the
    * oracle compares (window struct → start/end BIGINT).
    */
  def windowToEpoch(df: DataFrame, keyCols: Column*): DataFrame =
    df.select((Seq(epochUs(col("w.start")).as("ws_us"),
      epochUs(col("w.end")).as("we_us")) ++ keyCols ++
      Seq(col("n"), col("sum_value"))): _*)

  /** Watermarked stream-stream inner join: purchases joined to the
    * same user's clicks within [-30m, 0] of the purchase. Both sides
    * carry watermarks and the join condition bounds the time range, so
    * each side's buffered state is evicted once the other side's
    * watermark passes the range — bounded state, the only
    * stream-stream join shape that survives unbounded inputs.
    * Works identically on batch frames (the spec's batch twin).
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame =
    purchases.alias("p").join(clicks.alias("c"),
      col("p.user_id") === col("c.user_id") &&
        col("c.ts") >= col("p.ts") - expr("INTERVAL 30 MINUTES") &&
        col("c.ts") <= col("p.ts"))
      .select(col("p.user_id").as("user_id"),
        col("p.event_id").as("purchase_id"), col("c.event_id").as("click_id"),
        epochUs(col("p.ts")).as("p_us"), epochUs(col("c.ts")).as("c_us"))

  /** Incremental JSON append sink (streaming twin of the reference's
    * flush-per-record JSONL append): file sink + checkpoint =
    * exactly-once.
    */
  def appendJsonSink(events: DataFrame, outDir: String,
                     checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .format("json")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
