package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing (north-star: image/audio/video as opaque
  * binary columns with typed metadata).
  *
  * The container has no media codecs, so the *decode* step is a seam —
  * [[Decoder]] — with a deterministic stub; everything Spark-side is
  * real and tested: binary payload columns, typed metadata, partition-
  * parallel batched decoding via `mapPartitions` over a typed Dataset
  * (the JVM analogue of a Pandas-UDF `mapInPandas` batch loop), stride-
  * based frame sampling, and fixed-width feature vectors.
  *
  * Scale design: decode runs executor-side once per partition-batch; a
  * real decoder (JNI/ffmpeg/JCodec) drops in behind the same trait with
  * no plan change. Payloads stay columnar binary end-to-end — never
  * collected, never stringified.
  */
object Multimodal {

  /** A media row: opaque bytes + the metadata a catalog would carry. */
  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte], byte_len: Long)

  /** Extracted features for one media row. */
  final case class MediaFeatures(media_id: Long, modality: String,
                                 byte_len: Long, n_frames: Long,
                                 frame_stride: Long, signature: Long,
                                 features: Array[Double])

  /** Decode seam: bytes → sampled frame payloads. A real implementation
    * would wrap an image/audio codec; the stub slices deterministic
    * fixed-stride byte windows ("frames") out of the payload.
    */
  trait Decoder extends Serializable {
    def frameStride: Int
    def frameLen: Int
    def sampleFrames(payload: Array[Byte]): Vector[Array[Byte]]
  }

  /** Deterministic stub decoder: frame i = bytes [i·stride, i·stride+len). */
  final case class StubDecoder(frameStride: Int = 40, frameLen: Int = 8)
      extends Decoder {
    def sampleFrames(payload: Array[Byte]): Vector[Array[Byte]] = {
      val n = math.max(1, (payload.length + frameStride - 1) / frameStride)
      (0 until n).map { i =>
        payload.slice(i * frameStride, math.min(i * frameStride + frameLen, payload.length))
      }.toVector
    }
  }

  /** Windowed energy readout for one media row (audio-shaped). */
  final case class MediaEnergy(media_id: Long, modality: String,
                               n_windows: Long, total_energy: Long,
                               peak_energy: Long, peak_win: Long)

  /** Windowed signal-energy extraction — the audio analogue of
    * [[featurize]]: fixed-length contiguous byte windows (the stub
    * "PCM frames"; a real deployment decodes the codec first behind
    * the same [[Decoder]] seam), per-window energy = Σ (b − 32)² over
    * the window's bytes (32 = the payload's "silence" byte), reduced
    * executor-side to the per-media readout an audio curation pass
    * keys on: window count, total energy, peak energy and the first
    * window attaining it. All-integer arithmetic — no float path at
    * all — and one `mapPartitions` batch pass; payloads are never
    * collected.
    */
  def windowEnergy(media: Dataset[MediaRow], windowLen: Int = 40)
                  (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = math.max(1, (m.payload.length + windowLen - 1) / windowLen)
        var total = 0L
        var peak = Long.MinValue
        var peakWin = 0L
        var i = 0
        while (i < n) {
          var e = 0L
          var j = i * windowLen
          val end = math.min(j + windowLen, m.payload.length)
          while (j < end) {
            val v = ((m.payload(j) & 0xff) - 32).toLong
            e += v * v
            j += 1
          }
          total += e
          if (e > peak) { peak = e; peakWin = i.toLong }
          i += 1
        }
        MediaEnergy(m.media_id, m.modality, n.toLong, total, peak, peakWin)
      }
    }.toDF()
  }

  /** Frame-histogram readout for one media row (video-shaped). */
  final case class FrameHist(media_id: Long, n_frames: Long,
                             n_dup_pairs: Long, min_l1: Option[Long],
                             mean_entropy_ppb: Long)

  /** Per-frame luminance-histogram extraction — the image/video
    * analogue of [[windowEnergy]] and the duplicate-frame screen a
    * video curation pass keys on. Frames are the stub decode (64-byte
    * "pixel" windows cycled over the payload so every frame is exactly
    * 64 px; a real codec replaces the slicing behind [[Decoder]] with
    * no plan change), each reduced to an 8-bin histogram (pixel DIV
    * 32). Readouts per media: adjacent-frame histogram L1 distances
    * (duplicate pair = L1 ≤ [[dupL1Threshold]], plus the min — all
    * exact BIGINTs) and the mean frame entropy in exact integer ppb
    * (per-bin −p·ln p terms rounded once on the 1e-9 grid from the
    * ≤64 distinct (count, 64) rationals, then integer-summed — the
    * q_perplexity ln-grid discipline, so no float accumulation order
    * exists).
    *
    * Scale: one mapPartitions batch pass; per media the state is 8
    * ints × ≤[[maxFrames]] frames regardless of payload size, and
    * payloads never leave the scan stage.
    */
  val frameLenPx = 64
  val maxFrames = 8
  val dupL1Threshold = 16L

  def frameHistograms(media: Dataset[MediaRow])
                     (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val len = m.payload.length
        val nf = math.min(maxFrames, math.max(1, (len + frameLenPx - 1) / frameLenPx))
        val hists = Array.ofDim[Long](nf, 8)
        // len == 0: no pixels to cycle — the single frame keeps its
        // all-zero histogram (mirrored in the DuckDB oracle twin)
        var f = 0
        while (len > 0 && f < nf) {
          var j = 0
          while (j < frameLenPx) {
            val px = m.payload((f * frameLenPx + j) % len) & 0xff
            hists(f)(px / 32) += 1L
            j += 1
          }
          f += 1
        }
        var entropySum = 0L // Σ of per-frame entropies, each in e9 units
        f = 0
        while (f < nf) {
          var b = 0
          while (b < 8) {
            val n = hists(f)(b)
            if (n > 0L) {
              val p = n.toDouble / frameLenPx
              entropySum += math.round(-p * math.log(p) * 1e9)
            }
            b += 1
          }
          f += 1
        }
        var dups = 0L
        var minL1 = Long.MaxValue
        f = 1
        while (f < nf) {
          var l1 = 0L
          var b = 0
          while (b < 8) {
            l1 += math.abs(hists(f)(b) - hists(f - 1)(b))
            b += 1
          }
          if (l1 <= dupL1Threshold) dups += 1L
          if (l1 < minL1) minL1 = l1
          f += 1
        }
        FrameHist(m.media_id, nf.toLong, dups,
          if (nf > 1) Some(minL1) else None, entropySum / nf)
      }
    }.toDF()
  }

  /** [[frameHistograms]] over REAL decoded frames (r15, VERDICT r14
    * task #2): `decodeLum` turns a payload into per-frame luminance
    * arrays (each exactly [[frameLenPx]] pixels — e.g. an animated-GIF
    * decode of 8×8 frames), and the readout is the same 8-bin
    * histogram / adjacent-L1 dup screen / integer-ppb entropy as the
    * stub path — same contract, pixels instead of encoded bytes. One
    * mapPartitions batch pass; payloads never leave the scan.
    */
  def frameHistogramsOf(media: Dataset[MediaRow],
      decodeLum: Array[Byte] => Seq[Array[Int]])
      (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val frames = decodeLum(m.payload)
        val nf = frames.length
        require(nf >= 1, s"media ${m.media_id}: no frames decoded")
        val hists = Array.ofDim[Long](nf, 8)
        var f = 0
        while (f < nf) {
          val px = frames(f)
          require(px.length == frameLenPx,
            s"media ${m.media_id}: frame $f has ${px.length} px, " +
              s"expected $frameLenPx")
          var j = 0
          while (j < frameLenPx) { hists(f)(px(j) / 32) += 1L; j += 1 }
          f += 1
        }
        var entropySum = 0L
        f = 0
        while (f < nf) {
          var b = 0
          while (b < 8) {
            val n = hists(f)(b)
            if (n > 0L) {
              val p = n.toDouble / frameLenPx
              entropySum += math.round(-p * math.log(p) * 1e9)
            }
            b += 1
          }
          f += 1
        }
        var dups = 0L
        var minL1 = Long.MaxValue
        f = 1
        while (f < nf) {
          var l1 = 0L
          var b = 0
          while (b < 8) {
            l1 += math.abs(hists(f)(b) - hists(f - 1)(b))
            b += 1
          }
          if (l1 <= dupL1Threshold) dups += 1L
          if (l1 < minL1) minL1 = l1
          f += 1
        }
        FrameHist(m.media_id, nf.toLong, dups,
          if (nf > 1) Some(minL1) else None, entropySum / nf)
      }
    }.toDF()
  }

  /** dHash geometry: the canonical 9-wide × 8-tall grayscale grid
    * (64 horizontal gradient-sign bits). */
  val dhashCols = 9
  val dhashRows = 8

  /** Decoded-pixel dHash grid (r15, VERDICT r14 #2): integer
    * luminance ((299R+587G+114B)/1000 — exact when R=G=B) + area-mean
    * box resize of a decoded RGB frame stack (frames = pixel rows, 3
    * bytes/px, the [[Decoder]] row convention) down to 8×9. For an
    * image that is ALREADY 9×8 the resize is the identity, which is
    * what keeps q_dedup_phash's oracle closed-form; for larger images
    * (PhashPixelSpec's 48×32 PNG-vs-JPEG twin) each cell is the mean
    * of its pixel box — the smoothing that makes dHash robust to
    * lossy re-encoding.
    */
  def dhashGrid(rows: Vector[Array[Byte]]): Array[Int] = {
    val h = rows.length
    val w = if (h == 0) 0 else rows.head.length / 3
    require(h >= dhashRows && w >= dhashCols,
      s"dhashGrid: image ${w}x$h smaller than the ${dhashCols}x$dhashRows grid")
    val out = new Array[Int](dhashRows * dhashCols)
    var r = 0
    while (r < dhashRows) {
      val y0 = r * h / dhashRows
      val y1 = (r + 1) * h / dhashRows
      var c = 0
      while (c < dhashCols) {
        val x0 = c * w / dhashCols
        val x1 = (c + 1) * w / dhashCols
        var sum = 0L
        var n = 0L
        var y = y0
        while (y < y1) {
          val row = rows(y)
          var x = x0
          while (x < x1) {
            val rr = row(x * 3) & 0xff
            val gg = row(x * 3 + 1) & 0xff
            val bb = row(x * 3 + 2) & 0xff
            sum += (299L * rr + 587L * gg + 114L * bb) / 1000L
            n += 1
            x += 1
          }
          y += 1
        }
        out(r * dhashCols + c) = (sum / n).toInt
        c += 1
      }
      r += 1
    }
    out
  }

  /** 64 dHash gradient-sign bits (row r, col c: grid(r,c) > grid(r,c+1))
    * folded MSB-first into two 32-bit halves — two BIGINTs instead of
    * one 64-bit fold because a*2+b over 64 bits overflows signed
    * BIGINT in both engines (the q_dedup_phash convention).
    */
  def dhashSig(grid: Array[Int]): (Long, Long) = {
    var hi = 0L
    var lo = 0L
    var r = 0
    while (r < dhashRows) {
      var c = 0
      while (c < 8) {
        val bit =
          if (grid(r * dhashCols + c) > grid(r * dhashCols + c + 1)) 1L else 0L
        if (r * 8 + c < 32) hi = hi * 2 + bit else lo = lo * 2 + bit
        c += 1
      }
      r += 1
    }
    (hi, lo)
  }

  /** Channel readout of a decoded RGB image. */
  /** Sniff-routing image decoder (r16): routes each payload to the
    * matching real codec by magic — what a MIXED-container image
    * column (the shape web corpora actually have) needs behind one
    * decode seam. Non-image / unknown payloads are loud, not skipped.
    */
  final case class ImageRowDecoder() extends Decoder {
    def frameStride: Int = 0
    def frameLen: Int = 0
    def sampleFrames(payload: Array[Byte]): Vector[Array[Byte]] =
      detectFormat(payload) match {
        case "image/gif" => Gif.decode(payload).rows
        case "image/png" => Png.decodeRgb8(payload).rows
        case "image/bmp" => Bmp.RowDecoder().sampleFrames(payload)
        case f if f.startsWith("image/jpeg") =>
          Jpeg.RowDecoder().sampleFrames(payload)
        case other => throw new IllegalArgumentException(
          s"not a decodable image container: $other")
      }
  }

  final case class RgbReadout(media_id: Long, width: Long, height: Long,
                              n_pixels: Long, sum_r: Long, sum_g: Long,
                              sum_b: Long, checksum: Long)

  /** Decode + channel-sum readout for RGB ROW decoders (frames =
    * pixel rows, 3 bytes/pixel in RGB order — e.g. [[Bmp.RowDecoder]],
    * the real-format path through this seam). Exact integer outputs:
    * geometry, per-channel sums, and a POSITION-WEIGHTED checksum
    * Σ (idx+1)·value over the row-major (y, x, channel) byte order —
    * any decoder mistake that keeps the multiset of bytes but moves
    * one (row flip, BGR/RGB swap, padding leak) changes the checksum,
    * which is what the closed-form oracle twin compares against.
    * One mapPartitions batch pass; payloads never leave the scan.
    */
  def decodeRgbReadout(media: Dataset[MediaRow], decoder: Decoder)
                      (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val frames = decoder.sampleFrames(m.payload)
        val height = frames.length
        val width = if (height == 0) 0 else frames.head.length / 3
        var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
        var y = 0
        while (y < height) {
          val row = frames(y)
          var x = 0
          while (x < width) {
            val base = (y.toLong * width + x) * 3
            val r = row(x * 3) & 0xff
            val g = row(x * 3 + 1) & 0xff
            val b = row(x * 3 + 2) & 0xff
            sr += r; sg += g; sb += b
            ck += (base + 1) * r + (base + 2) * g + (base + 3) * b
            x += 1
          }
          y += 1
        }
        RgbReadout(m.media_id, width.toLong, height.toLong,
          width.toLong * height, sr, sg, sb, ck)
      }
    }.toDF()
  }

  /** Per-FRAME readout of a multi-frame decode (r16 — the animation
    * twin of [[RgbReadout]]): one row per (media, frame index).
    */
  final case class FrameRgbReadout(media_id: Long, frame: Long,
                                   width: Long, height: Long,
                                   sum_r: Long, sum_g: Long, sum_b: Long,
                                   checksum: Long)

  /** Decode + per-frame channel-sum readout for animated payloads:
    * `decode` returns (width, height, top-down RGB rows) per frame
    * (e.g. [[Gif.decodeFrames]] composited snapshots). Same exact
    * integer outputs and position-weighted checksum as
    * [[decodeRgbReadout]], per frame. One mapPartitions batch pass.
    */
  def decodeRgbFramesReadout(media: Dataset[MediaRow],
      decode: Array[Byte] => Vector[(Int, Int, Vector[Array[Byte]])])
      (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { m =>
        decode(m.payload).zipWithIndex.map { case ((width, height, fr), f) =>
          var sr = 0L; var sg = 0L; var sb = 0L; var ck = 0L
          var y = 0
          while (y < height) {
            val row = fr(y)
            var x = 0
            while (x < width) {
              val base = (y.toLong * width + x) * 3
              val r = row(x * 3) & 0xff
              val g = row(x * 3 + 1) & 0xff
              val b = row(x * 3 + 2) & 0xff
              sr += r; sg += g; sb += b
              ck += (base + 1) * r + (base + 2) * g + (base + 3) * b
              x += 1
            }
            y += 1
          }
          FrameRgbReadout(m.media_id, f.toLong, width.toLong, height.toLong,
            sr, sg, sb, ck)
        }
      }
    }.toDF()
  }

  /** Sample readout of decoded PCM audio. */
  final case class PcmReadout(media_id: Long, sample_rate: Long,
                              n_channels: Long, n_samples: Long,
                              sum_samples: Long, sum_abs: Long,
                              peak_abs: Long, checksum: Long)

  /** Decode + sample-sum readout for PCM audio payloads (the audio
    * twin of [[decodeRgbReadout]]; `decode` is e.g. [[Wav.decodePcm16]]
    * — the real-container path through this seam). Exact integer
    * outputs: header metadata, signed sample sum, absolute sum, peak
    * amplitude, and the POSITION-WEIGHTED checksum Σ (i+1)·sample(i)
    * over interleave order — a decoder mistake that keeps the sample
    * multiset but reorders it (endianness slip, channel deinterleave
    * bug, chunk-offset error) changes the checksum, which the
    * closed-form oracle twin compares against. One mapPartitions
    * batch pass; payloads never leave the scan.
    */
  def decodePcmReadout(media: Dataset[MediaRow],
                       decode: Array[Byte] => Wav.Parsed)
                      (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val p = decode(m.payload)
        var sumS = 0L; var sumA = 0L; var peak = 0L; var ck = 0L
        var i = 0
        while (i < p.samples.length) {
          val v = p.samples(i).toLong
          sumS += v
          val a = math.abs(v)
          sumA += a
          if (a > peak) peak = a
          ck += (i + 1) * v
          i += 1
        }
        PcmReadout(m.media_id, p.sampleRate.toLong, p.channels.toLong,
          p.samples.length.toLong, sumS, sumA, peak, ck)
      }
    }.toDF()
  }

  /** Magic-byte container sniffing — the triage pass a multimodal
    * catalog runs BEFORE any decode is attempted (route to the right
    * decoder, quarantine the rest). Detection reads only the fixed
    * header prefix; payloads are never parsed here.
    */
  def detectFormat(payload: Array[Byte]): String = {
    def at(i: Int, c: Char): Boolean =
      i < payload.length && payload(i) == c.toByte
    def byteAt(i: Int, v: Int): Boolean =
      i < payload.length && payload(i) == v.toByte
    if (at(0, 'B') && at(1, 'M')) "image/bmp"
    else if (at(0, 'R') && at(1, 'I') && at(2, 'F') && at(3, 'F') &&
      at(8, 'W') && at(9, 'A') && at(10, 'V') && at(11, 'E')) "audio/wav"
    else if (byteAt(0, 0x89) && at(1, 'P') && at(2, 'N') && at(3, 'G') &&
      byteAt(4, 0x0d) && byteAt(5, 0x0a) && byteAt(6, 0x1a) && byteAt(7, 0x0a))
      "image/png"
    else if (at(0, '%') && at(1, 'P') && at(2, 'D') && at(3, 'F')) "application/pdf"
    else if (at(0, 'G') && at(1, 'I') && at(2, 'F') && at(3, '8') &&
      (at(4, '7') || at(4, '9')) && at(5, 'a')) "image/gif"
    else if (byteAt(0, 0xff) && byteAt(1, 0xd8) && byteAt(2, 0xff))
      sniffJpegSof(payload)
    else "unknown"
  }

  /** JPEG frame-type triage: walk the marker chain (bounded — headers
    * precede entropy data, and each hop reads 4 bytes) to the first
    * start-of-frame and split baseline (SOF0/1, sequential DCT) from
    * progressive (SOF2) — web corpora are ~10–20% progressive, and the
    * baseline-only decoder ([[graft.ops.Jpeg]]) must never be handed
    * one. Anything else frame-typed (SOF3..15) or truncated before a
    * SOF routes as plain "image/jpeg".
    */
  private def sniffJpegSof(payload: Array[Byte]): String = {
    var i = 2 // past SOI
    var steps = 0
    while (i + 3 < payload.length && steps < 64 &&
        (payload(i) & 0xff) == 0xff) {
      val m = payload(i + 1) & 0xff
      if (m == 0xc0 || m == 0xc1) return "image/jpeg"
      if (m == 0xc2) return "image/jpeg;progressive"
      if (m == 0xda || m == 0xd9) return "image/jpeg" // scan/EOI: no SOF seen
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // bare markers
      else {
        val len = ((payload(i + 2) & 0xff) << 8) | (payload(i + 3) & 0xff)
        i += 2 + len
      }
      steps += 1
    }
    "image/jpeg"
  }

  /** Polynomial byte hash — same fold as TextAnalysis (portable). */
  private def byteHash(bytes: Array[Byte]): Long =
    bytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % TextAnalysis.P)

  /** Partition-parallel batched decode + featurize. */
  def featurize(media: Dataset[MediaRow], decoder: Decoder = StubDecoder())
               (implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val frames = decoder.sampleFrames(m.payload)
        val hashes = frames.map(byteHash)
        val sig = hashes.foldLeft(0L)((a, h) => (a + h) % TextAnalysis.P)
        // fixed-width feature vector: mean byte value of first 4 frames
        val feats = frames.take(4).map(f =>
          if (f.isEmpty) 0.0 else f.map(b => (b & 0xff).toDouble).sum / f.length)
          .padTo(4, 0.0).toArray
        MediaFeatures(m.media_id, m.modality, m.byte_len,
          frames.length.toLong, decoder.frameStride.toLong, sig, feats)
      }
    }.toDF()
  }
}
