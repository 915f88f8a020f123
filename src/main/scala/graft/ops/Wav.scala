package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free RIFF/WAVE PCM16 writer + parser — the audio twin of
  * [[Bmp]] behind the multimodal seam. [[Bmp]] proved real image
  * payloads flow through the decode plumbing; this proves the audio
  * modality with the other canonical uncompressed public container.
  *
  * Format notes (public spec): 12-byte RIFF header (`RIFF` magic,
  * riff size, `WAVE` form type) followed by chunks, each an 8-byte
  * header (4-char id + LE uint32 payload size) plus payload padded to
  * an even boundary. The `fmt ` chunk carries audio format (1 = PCM),
  * channel count, sample rate, byte rate, block align and bits per
  * sample; the `data` chunk carries the interleaved LE samples. The
  * parser walks the chunk list (unknown chunks are legal and skipped —
  * real-world WAVs carry LIST/INFO/fact chunks), validates PCM16, and
  * returns the samples plus header metadata. All multi-byte fields are
  * little-endian.
  *
  * Scale: encode/decode are per-sample loops inside the executor
  * (mapPartitions batch); payloads never leave the scan stage —
  * identical altitude to [[Bmp.RowDecoder]].
  */
object Wav {

  /** Encode mono/interleaved PCM16 samples as a minimal RIFF/WAVE. */
  def encodePcm16(sampleRate: Int, channels: Int,
                  samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0)
    require(samples.length % channels == 0, "ragged final frame")
    // PCM16 data chunks are always even-length (2 bytes/sample), so
    // the spec's odd-chunk pad byte is structurally unreachable here
    val dataLen = samples.length * 2
    val size = 12 + 8 + 16 + 8 + dataLen
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(size - 8)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parsed audio: interleaved samples + the header metadata. */
  final case class Parsed(sampleRate: Int, channels: Int,
                          samples: Array[Short])

  def decodePcm16(bytes: Array[Byte]): Parsed = {
    require(bytes.length >= 12, "truncated RIFF header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    require(fourCC(0) == "RIFF" && fourCC(8) == "WAVE", "bad WAVE magic")
    var off = 12
    var sampleRate = 0
    var channels = 0
    var sawFmt = false
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (samples == null || !sawFmt)) {
      val id = fourCC(off)
      val len = buf.getInt(off + 4)
      // Long arithmetic: off + 8 + len overflows Int for an adversarial
      // chunk length near Int.MaxValue, which would pass this require and
      // crash later with an unrelated exception (ADVICE r10)
      require(len >= 0 && off.toLong + 8 + len <= bytes.length,
        s"truncated chunk $id")
      id match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          val fmt = buf.getShort(off + 8).toInt
          require(fmt == 1, s"unsupported WAVE format $fmt (PCM only)")
          channels = buf.getShort(off + 10).toInt
          sampleRate = buf.getInt(off + 12)
          val bps = buf.getShort(off + 22).toInt
          require(bps == 16, s"unsupported bits/sample $bps")
          sawFmt = true
        case "data" =>
          require(len % 2 == 0, "odd PCM16 data length")
          samples = new Array[Short](len / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = buf.getShort(off + 8 + i * 2)
            i += 1
          }
        case _ => () // LIST/INFO/fact/...: legal, skipped
      }
      off += 8 + len + (len & 1) // chunks are even-aligned
    }
    require(sawFmt, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    // re-establish the encoder's invariants (review r10): a channels=0
    // fmt or a ragged final frame would otherwise flow silently into
    // consumers that divide by the channel count
    require(channels > 0, s"bad channel count $channels")
    require(sampleRate > 0, s"bad sample rate $sampleRate")
    require(samples.length % channels == 0,
      s"ragged PCM data: ${samples.length} samples over $channels channels")
    Parsed(sampleRate, channels, samples)
  }
}
