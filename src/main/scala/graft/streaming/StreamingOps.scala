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

  /** Streaming dedup by event_id (exact, state bounded by watermark). */
  def dedup(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Project a windowed result to the deterministic epoch-µs shape the
    * oracle compares (window struct → start/end BIGINT).
    */
  def windowToEpoch(df: DataFrame, keyCols: Column*): DataFrame =
    df.select((Seq(epochUs(col("w.start")).as("ws_us"),
      epochUs(col("w.end")).as("we_us")) ++ keyCols ++
      Seq(col("n"), col("sum_value"))): _*)

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
