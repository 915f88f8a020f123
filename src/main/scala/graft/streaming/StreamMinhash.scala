package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming NEAR-duplicate dedup (VERDICT r10 #2): the MinHash band
  * index as STREAMING STATE. q_stream_dedup is exact-key only and
  * q_dedup_incremental is batch-vs-corpus; this closes the remaining
  * corner — documents arriving on a stream, each probed against every
  * predecessor through the same 16-perm/4×4-band/Jaccard-≥3/5
  * contract as the batch family (the shared DedupQueries fragments),
  * incrementally.
  *
  * Shape: band keys are the state-store KEYS (`transformWithState`
  * keyed by band_key — the TwsOps precedent), so the stream partitions
  * by band exactly like the batch band-join shuffles by band, and each
  * arriving document compares ONLY against the bounded per-key
  * collision list — never the corpus. Matches emit as (min, max) id
  * pairs regardless of arrival order, so the drained pair set equals
  * the batch candidate-verify pair set exactly (StreamDedupMinhashSpec
  * proves incremental == batch drop list); a document arriving through
  * k bands can emit a pair k times — the downstream consumer
  * de-duplicates, exactly as the batch plan's DISTINCT does.
  *
  * State bound: [[MaxPerBand]] stored docs per band key — the
  * production memory guard (beyond it, new entries are not indexed and
  * a collision-list overflow trades recall for bounded state, the
  * standard LSH-index compromise). The planted corpus never
  * approaches it, so the batch-equality proof is exact.
  */
object StreamMinhash {

  /** A document entering the dedup stream: id + word array. */
  final case class DocWords(doc_id: Long, ws: Seq[String])

  /** One (band_key, doc) row after signature banding. */
  final case class BandDoc(band_key: String, doc_id: Long, sh: Seq[Long])

  /** A verified near-dup pair, doc_a < doc_b. */
  final case class MatchPair(doc_a: Long, doc_b: Long)

  val MaxPerBand = 256

  /** Exact merge-intersect Jaccard bound over sorted-distinct shingle
    * arrays — the integer-exact 5·|∩| ≥ 3·|∪| contract of
    * DedupQueries.verifiedStats, as a plain JVM walk.
    */
  private[graft] def verifiedPair(a: Seq[Long], b: Seq[Long]): Boolean = {
    var i = 0; var j = 0; var nInt = 0L
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c == 0) { nInt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val nTot = (a.length + b.length).toLong
    5L * nInt >= 3L * (nTot - nInt)
  }

  /** Band-index state machine: per band key a bounded list of stored
    * docs; each arriving doc is verified against the stored collision
    * list and then indexed itself.
    */
  class BandIndexProcessor
      extends StatefulProcessor[String, BandDoc, MatchPair] {

    @transient private var docs: ListState[BandDoc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docs = getHandle.getListState[BandDoc]("docs",
        Encoders.product[BandDoc], TTLConfig.NONE)

    override def handleInputRows(bandKey: String, rows: Iterator[BandDoc],
        timerValues: TimerValues): Iterator[MatchPair] = {
      // within-batch arrival is unordered: process in doc_id order so
      // a batch split cannot change which doc counts as "stored first"
      val incoming = rows.toArray.sortBy(_.doc_id)
      var stored = docs.get().toArray
      val out = Vector.newBuilder[MatchPair]
      incoming.foreach { d =>
        stored.foreach { s =>
          if (s.doc_id != d.doc_id && verifiedPair(s.sh, d.sh))
            out += MatchPair(math.min(s.doc_id, d.doc_id),
              math.max(s.doc_id, d.doc_id))
        }
        if (stored.length < MaxPerBand) {
          docs.appendValue(d)
          stored = stored :+ d
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(bandKey: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[MatchPair] =
      Iterator.empty
  }

  /** Signature + banding as per-row columns (streamable: no shuffle,
    * no state — the same shingle/minhash/band arithmetic as the batch
    * family via the shared expressions).
    */
  def bandKeyed(docs: Dataset[DocWords]): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    docs.toDF()
      .withColumn("sh", graft.functions.GraftFunctions.shingleHashes(col("ws"), 3))
      .withColumn("sigs", graft.functions.SketchFunctions.minHashSigs(col("sh"), 16))
      .select(explode(expr(graft.queries.DedupQueries.bandsSpark)).as("band_key"),
        col("doc_id"), col("sh"))
      .as[BandDoc]
  }

  /** Incremental band-index probe: every arriving doc verified against
    * the banded state, emitting (min, max) verified pairs (possibly
    * once per shared band — consumer de-duplicates).
    */
  def bandMatches(docs: Dataset[DocWords]): Dataset[MatchPair] = {
    import docs.sparkSession.implicits._
    bandKeyed(docs)
      .groupByKey(_.band_key)
      .transformWithState(new BandIndexProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
