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
