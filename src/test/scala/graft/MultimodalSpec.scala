package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.{MediaRow, StubDecoder}

/** Multimodal plumbing: schema, batching, frame sampling, features. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stub decoder frame sampling: stride windows, short tail, min one frame") {
    val d = StubDecoder(frameStride = 40, frameLen = 8)
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val frames = d.sampleFrames(payload)
    assert(frames.length == 3) // ceil(100/40)
    assert(frames(0).toSeq == (0 until 8).map(_.toByte))
    assert(frames(2).toSeq == (80 until 88).map(_.toByte))
    assert(d.sampleFrames(Array.emptyByteArray).length == 1)
  }

  test("featurize: typed Dataset → mapPartitions → stable features") {
    implicit val s = spark
    import s.implicits._
    val media = Seq(
      MediaRow(1L, "image", "hello world, this is fake image data".getBytes("UTF-8"), 36L),
      MediaRow(2L, "audio", ("x" * 100).getBytes("UTF-8"), 100L))
      .toDS()
    val out = Multimodal.featurize(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_frames") == 1)
    assert(out(2L).getAs[Long]("n_frames") == 3)
    assert(out(2L).getAs[Seq[Double]]("features").take(3).forall(_ == 'x'.toInt.toDouble))
    // determinism: same input → same signature
    val again = Multimodal.featurize(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("signature")).toMap
    assert(again(1L) == out(1L).getAs[Long]("signature"))
  }

  test("frameHistograms: hand-computed histograms, L1 dups, entropy grid") {
    implicit val s = spark
    import s.implicits._
    val media = Seq(
      // two maximally-different frames: 64×byte0 (bin 0) then 64×byte255
      // (bin 7) → L1 = 128, no dup pair, both frames entropy 0
      MediaRow(1L, "video", Array.fill[Byte](64)(0) ++ Array.fill[Byte](64)(-1), 128L),
      // 32-byte payload cycled to one 64-px frame: 16×10 + 16×40 → each
      // counted twice → hist [32, 32, 0...] → entropy = ln 2
      MediaRow(2L, "video", (Array.fill[Byte](16)(10) ++ Array.fill[Byte](16)(40)), 32L),
      // two identical frames → L1 = 0 → one dup pair
      MediaRow(3L, "video", Array.fill[Byte](128)(100), 128L))
      .toDS()
    val out = Multimodal.frameHistograms(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_frames") == 2)
    assert(out(1L).getAs[Long]("n_dup_pairs") == 0)
    assert(out(1L).getAs[Long]("min_l1") == 128)
    assert(out(1L).getAs[Long]("mean_entropy_ppb") == 0)
    assert(out(2L).getAs[Long]("n_frames") == 1)
    assert(out(2L).isNullAt(out(2L).fieldIndex("min_l1"))) // single frame
    // 2 bins at p=1/2: 2·round(0.5·ln 2·1e9) = 693147180 ppb
    assert(out(2L).getAs[Long]("mean_entropy_ppb") == 693147180L)
    assert(out(3L).getAs[Long]("n_dup_pairs") == 1)
    assert(out(3L).getAs[Long]("min_l1") == 0)
  }

  test("frameHistograms: empty payload → one all-zero-histogram frame") {
    implicit val s = spark
    import s.implicits._
    val media = Seq(MediaRow(9L, "video", Array.emptyByteArray, 0L)).toDS()
    val r = Multimodal.frameHistograms(media).collect().head
    assert(r.getAs[Long]("n_frames") == 1L)
    assert(r.getAs[Long]("n_dup_pairs") == 0L)
    assert(r.isNullAt(r.fieldIndex("min_l1")))
    assert(r.getAs[Long]("mean_entropy_ppb") == 0L)
  }

  test("stub-payload oracle parity requires an ASCII corpus (pinned)") {
    // q_frame_hist bins Spark BYTES vs DuckDB CHARACTERS — identical
    // only while the fixture corpus is pure ASCII (see the QueryDef
    // scaladoc). This gate fails loudly if a regeneration adds
    // non-ASCII text, before the oracle hash silently diverges.
    import org.apache.spark.sql.functions._
    val nonAscii = graft.core.Tables.documents(spark, TestSpark.sf)
      .filter(not(col("text").rlike("^[\\x00-\\x7F]*$"))).count()
    assert(nonAscii == 0L, s"$nonAscii non-ASCII documents in fixtures")
  }

  test("windowEnergy: hand-computed windows, peak tie → first window") {
    implicit val s = spark
    import s.implicits._
    // 3 windows of 2 bytes: energies (0-32)²·2=2048, (33-32)²+(34-32)²=5,
    // one-byte tail (95-32)²=3969; then a payload with a peak TIE
    val media = Seq(
      MediaRow(1L, "audio", Array[Byte](0, 0, 33, 34, 95), 5L),
      MediaRow(2L, "audio", Array[Byte](40, 32, 32, 40), 4L))
      .toDS()
    val out = Multimodal.windowEnergy(media, windowLen = 2).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_windows") == 3)
    assert(out(1L).getAs[Long]("total_energy") == 2048 + 5 + 3969)
    assert(out(1L).getAs[Long]("peak_energy") == 3969)
    assert(out(1L).getAs[Long]("peak_win") == 2)
    // both windows of media 2 have energy 64 — first one must win
    assert(out(2L).getAs[Long]("peak_energy") == 64)
    assert(out(2L).getAs[Long]("peak_win") == 0)
  }
}
