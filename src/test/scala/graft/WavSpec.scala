package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Wav

/** WAV writer/parser invariants (q_wav_decode). Same rationale as
  * BmpSpec: the declared query only proves the ROUND TRIP, so an
  * encoder bug mirrored by a decoder bug (both byte-swapping, both
  * mis-sizing chunks) would cancel there. The golden bytes below are
  * hand-written straight from the public RIFF/WAVE spec, pinning the
  * encoder and decoder to the spec independently.
  */
class WavSpec extends AnyFunSuite {

  // 3-sample mono 8 kHz PCM16 file: samples 1, -2, 300. Data length 6
  // (even, no pad byte). Hand-assembled little-endian.
  private val golden: Array[Byte] = Array[Int](
    'R', 'I', 'F', 'F',
    42, 0, 0, 0,          // riff size = total 50 - 8
    'W', 'A', 'V', 'E',
    'f', 'm', 't', ' ',
    16, 0, 0, 0,          // fmt chunk length
    1, 0,                 // PCM
    1, 0,                 // mono
    0x40, 0x1f, 0, 0,     // 8000 Hz
    0x80, 0x3e, 0, 0,     // byte rate 16000
    2, 0,                 // block align
    16, 0,                // bits per sample
    'd', 'a', 't', 'a',
    6, 0, 0, 0,           // data length
    1, 0,                 // sample 1
    0xfe, 0xff,           // sample -2
    0x2c, 0x01            // sample 300
  ).map(_.toByte)

  test("encoder reproduces the hand-written golden bytes exactly") {
    assert(Wav.encodePcm16(8000, 1, Array[Short](1, -2, 300)).toSeq
      == golden.toSeq)
  }

  test("decoder reads the golden bytes") {
    val p = Wav.decodePcm16(golden)
    assert(p.sampleRate == 8000 && p.channels == 1)
    assert(p.samples.toSeq == Seq[Short](1, -2, 300))
  }

  test("decoder skips foreign chunks before fmt and data") {
    // legal WAVs carry LIST/fact/etc. chunks; insert a 5-byte LIST
    // chunk (odd length — exercises even-boundary chunk alignment)
    // between the RIFF header and fmt
    val foreign = Array[Int]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      1, 2, 3, 4, 5, 0 /* pad to even */).map(_.toByte)
    val spliced = golden.take(12) ++ foreign ++ golden.drop(12)
    spliced(4) = (42 + foreign.length).toByte // riff size
    val p = Wav.decodePcm16(spliced)
    assert(p.sampleRate == 8000 && p.samples.toSeq == Seq[Short](1, -2, 300))
  }

  test("round trip over sample counts, rates and channel layouts") {
    for (n <- Seq(1, 2, 79, 80); rate <- Seq(8000, 44100); ch <- Seq(1, 2)) {
      val samples = Array.tabulate(n * ch)(i => ((i * 131 % 4001) - 2000).toShort)
      val p = Wav.decodePcm16(Wav.encodePcm16(rate, ch, samples))
      assert(p.sampleRate == rate && p.channels == ch)
      assert(p.samples.toSeq == samples.toSeq)
    }
  }

  test("parser rejects non-WAV, non-PCM, wrong depth and truncated input") {
    intercept[IllegalArgumentException](
      Wav.decodePcm16("definitely not a wave file".getBytes))
    val bad1 = golden.clone(); bad1(20) = 3 // format 1 -> IEEE float
    intercept[IllegalArgumentException](Wav.decodePcm16(bad1))
    val bad2 = golden.clone(); bad2(34) = 8 // bits 16 -> 8
    intercept[IllegalArgumentException](Wav.decodePcm16(bad2))
    intercept[IllegalArgumentException](Wav.decodePcm16(golden.take(40)))
  }

  test("decoder re-establishes the encoder invariants on corrupt fmt") {
    val zeroCh = golden.clone(); zeroCh(22) = 0 // channels 1 -> 0
    intercept[IllegalArgumentException](Wav.decodePcm16(zeroCh))
    // 2 channels over 3 samples: ragged final frame must be rejected
    val ragged = golden.clone(); ragged(22) = 2
    intercept[IllegalArgumentException](Wav.decodePcm16(ragged))
  }
}
