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
