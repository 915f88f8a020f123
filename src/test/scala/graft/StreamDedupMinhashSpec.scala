package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}
import graft.streaming.StreamMinhash
import graft.streaming.StreamMinhash.{DocWords, MatchPair}

/** Streaming band-index near-dup dedup (q_stream_dedup_minhash): the
  * transformWithState processor must produce, incrementally across
  * MemoryStream batches, EXACTLY the drop list the batch twin
  * declares — same pairs, same earliest-match ids, same counts.
  */
class StreamDedupMinhashSpec extends AnyFunSuite {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def batchDropList: Map[Long, (Long, Long)] =
    SparkEntry.queries("q_stream_dedup_minhash")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def streamedDropList(nChunks: Int): Map[Long, (Long, Long)] = {
    TestSpark.withConfValue(Seq(
      "spark.sql.streaming.stateStore.providerClass" -> Provider)) {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val docs = graft.queries.DedupQueries.plantedWords(spark, sf)
        .as[DocWords].collect().sortBy(_.doc_id)
      val input = MemoryStream[DocWords]
      val q = StreamMinhash.bandMatches(input.toDS())
        .writeStream.format("memory").queryName("smh_out")
        .outputMode("append").option("checkpointLocation", TestSpark.ckpt()).start()
      try {
        // feed in doc_id order across several triggers: the state
        // must carry earlier chunks' band lists into later ones
        docs.grouped(math.max(1, (docs.length + nChunks - 1) / nChunks))
          .foreach { chunk =>
            input.addData(chunk.toIndexedSeq: _*)
            q.processAllAvailable()
          }
        val pairs = spark.table("smh_out").as[MatchPair].collect()
          .toSet // consumer-side de-dup of per-band re-emissions
        pairs.groupBy(_.doc_b).map { case (b, ps) =>
          b -> (ps.map(_.doc_a).min, ps.size.toLong)
        }
      } finally q.stop()
    }
  }

  test("incremental band-index dedup equals the batch drop list") {
    val batch = batchDropList
    val streamed = streamedDropList(nChunks = 4)
    assert(streamed == batch,
      s"streamed ${streamed.size} entries, batch ${batch.size}")
    assert(batch.nonEmpty)
    // the planted contract: every twin (doc_id >= 100000) resolves
    assert(batch.keys.count(_ >= 100000L) > 0)
  }

  test("chunking does not change the result (state carries across triggers)") {
    assert(streamedDropList(nChunks = 2) == streamedDropList(nChunks = 7))
  }
}
