package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.ops.{Bmp, Gif, Jpeg, Multimodal, Png, Wav}
import graft.util.Det._

/** Text-analysis + multimodal inventory (north-star: language-ID,
  * quality scoring, token counting, multimodal columns).
  */
object TextAnalysisQueries {

  private val langId = QueryDef(
    "q_lang_id",
    "N-gram-heuristic language ID: per-language word-frequency profiles " +
      "learned from the corpus itself (integer parts-per-million scores " +
      "— exact in both engines), capped to the top-64 words per language " +
      "(rank by ppm desc, word asc) so the broadcast stays bounded at " +
      "languages × 64 rows on any corpus size, each document classified " +
      "to the argmax profile. Classification is a map-side join + one " +
      "aggregation.",
    Some("""WITH ex AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
           |prof AS (SELECT lang AS plang, w, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY 1, 2),
           |tot AS (SELECT plang, CAST(sum(cnt) AS BIGINT) AS tot FROM prof GROUP BY 1),
           |iscore AS (SELECT p.plang, p.w, (p.cnt * 1000000) // t.tot AS ppm
           |           FROM prof p JOIN tot t ON p.plang = t.plang),
           |capped AS (SELECT plang, w, ppm FROM (
           |  SELECT *, row_number() OVER (PARTITION BY plang ORDER BY ppm DESC, w) AS rk
           |  FROM iscore) WHERE rk <= 64),
           |scored AS (
           |  SELECT e.doc_id, min(e.lang) AS actual_lang, i.plang,
           |         CAST(sum(i.ppm) AS BIGINT) AS score
           |  FROM ex e JOIN capped i ON e.w = i.w
           |  GROUP BY e.doc_id, i.plang),
           |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
           |           FROM scored)
           |SELECT doc_id, actual_lang, plang AS pred_lang, score,
           |       actual_lang = plang AS is_correct
           |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin),
    (s, d) => {
      // persist: the exploded word table feeds BOTH the profile build
      // and the classification join; uncached, the scan + split +
      // explode would run once per consumer (plus the final sort's
      // sampling pass)
      val ex = documentsSpread(s, d)
        .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
        .persist()
      val prof = ex.groupBy(col("lang").as("plang"), col("w"))
        .agg(lng(count(lit(1))).as("cnt"))
      val tot = prof.groupBy("plang").agg(lng(sum(col("cnt"))).as("tot"))
      val iscore = prof.join(tot, "plang")
        .select(col("plang"), col("w"), expr("(cnt * 1000000) DIV tot").as("ppm"))
      // bound the broadcast: top-64 words per language (deterministic
      // ppm-desc, word-asc rank) — languages × 64 rows on ANY corpus size,
      // vs the unbounded full (word × language) vocabulary
      val wk = Window.partitionBy("plang").orderBy(col("ppm").desc, col("w"))
      val capped = iscore.withColumn("rk", row_number().over(wk))
        .filter(col("rk") <= 64).drop("rk")
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("plang"))
      ex.join(broadcast(capped), "w")
        .groupBy("doc_id", "plang")
        .agg(min(col("lang")).as("actual_lang"), lng(sum(col("ppm"))).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("actual_lang"), col("plang").as("pred_lang"),
          col("score"), (col("actual_lang") === col("pred_lang")).as("is_correct"))
        .orderBy("doc_id")
    }
  )

  private val qualityScore = QueryDef(
    "q_quality_score",
    "Heuristic document quality scoring: length, stopword ratio, short-" +
      "word ratio, mean word length — weighted into one [0,1] score. " +
      "All ratios are int/int double divisions (engine-identical).",
    Some("""WITH t AS (
           |  SELECT doc_id, string_split(text, ' ') AS ws, length(text) AS chars FROM documents),
           |m AS (
           |  SELECT doc_id,
           |         CAST(len(ws) AS BIGINT) AS n_words,
           |         CAST(len(list_filter(ws, w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop,
           |         CAST(len(list_filter(ws, w -> length(w) <= 3)) AS BIGINT) AS n_short,
           |         CAST(chars AS BIGINT) AS chars
           |  FROM t)
           |SELECT doc_id, n_words, n_stop, n_short,
           |       round(CAST(chars - (n_words - 1) AS DOUBLE) / n_words, 6) AS avg_word_len,
           |       round(0.4 * (least(n_words, 100) / 100.0) +
           |             0.3 * (CAST(n_stop AS DOUBLE) / n_words) +
           |             0.3 * (1.0 - CAST(n_short AS DOUBLE) / n_words), 6) AS quality
           |FROM m ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"),
        lng(length(col("text"))).as("chars"))
      .select(col("doc_id"),
        lng(size(col("ws"))).as("n_words"),
        lng(size(expr("filter(ws, w -> w IN ('the', 'a'))"))).as("n_stop"),
        lng(size(expr("filter(ws, w -> length(w) <= 3)"))).as("n_short"),
        col("chars"))
      .select(col("doc_id"), col("n_words"), col("n_stop"), col("n_short"),
        round(dbl(col("chars") - (col("n_words") - 1)) / col("n_words"), 6).as("avg_word_len"),
        round(lit(0.4) * (least(col("n_words"), lit(100)) / lit(100.0)) +
          lit(0.3) * (dbl(col("n_stop")) / col("n_words")) +
          lit(0.3) * (lit(1.0) - dbl(col("n_short")) / col("n_words")), 6).as("quality"))
      .orderBy("doc_id")
  )

  private val tokenCount = QueryDef(
    "q_token_count",
    "Token counting: whitespace tokens, BPE-ish regex tokens " +
      "(letter-runs | digit-runs | other), and the chars/4 estimate.",
    Some("""SELECT doc_id,
           |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           |       CAST(len(regexp_extract_all(text, '([a-z]+|[0-9]+|[^a-z0-9 ])', 1)) AS BIGINT) AS re_tokens,
           |       (length(text) + 3) // 4 AS est_bpe
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d).select(
      col("doc_id"),
      lng(size(split(col("text"), " "))).as("ws_tokens"),
      lng(size(expr("regexp_extract_all(text, '([a-z]+|[0-9]+|[^a-z0-9 ])', 1)"))).as("re_tokens"),
      expr("(length(text) + 3) DIV 4").as("est_bpe"))
      .orderBy("doc_id")
  )

  private val multimodalMeta = QueryDef(
    "q_multimodal_meta",
    "Multimodal column plumbing: text bytes stand in for opaque media " +
      "payloads (no codecs in this environment — SURVEY.md §2 multimodal" +
      " STUB note); modality metadata, stride-sampled 'frames', per-" +
      "frame polynomial hashes and fixed-width features, all computed " +
      "executor-side via mapPartitions over a typed Dataset " +
      "(graft.ops.Multimodal). The oracle recomputes the stub decode " +
      "arithmetic in SQL.",
    Some(s"""WITH m AS (
            |  SELECT doc_id AS media_id,
            |         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS modality,
            |         text, CAST(length(text) AS BIGINT) AS byte_len,
            |         greatest((length(text) + 39) // 40, 1) AS n_frames
            |  FROM documents),
            |f AS (
            |  SELECT media_id, modality, byte_len, CAST(n_frames AS BIGINT) AS n_frames,
            |    list_transform(generate_series(0, CAST(n_frames AS INT) - 1),
            |      i -> substr(text, i * 40 + 1, 8)) AS frames
            |  FROM m),
            |h AS (
            |  SELECT media_id, modality, byte_len, n_frames,
            |    list_transform(frames, fr -> ${graft.ops.TextAnalysis.hashDuck("fr")}) AS fhs,
            |    frames
            |  FROM f)
            |SELECT media_id, modality, byte_len, n_frames,
            |       CAST(40 AS BIGINT) AS frame_stride,
            |       list_reduce(list_prepend(CAST(0 AS BIGINT), fhs), (a, x) -> (a + x) % ${graft.ops.TextAnalysis.P}) AS signature,
            |       round(CASE WHEN n_frames >= 1 THEN CAST(list_sum(list_transform(string_split(frames[1], ''), c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE) / length(frames[1]) ELSE 0.0 END, 6) AS feat0,
            |       round(CASE WHEN n_frames >= 2 THEN CAST(list_sum(list_transform(string_split(frames[2], ''), c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE) / length(frames[2]) ELSE 0.0 END, 6) AS feat1,
            |       round(CASE WHEN n_frames >= 3 THEN CAST(list_sum(list_transform(string_split(frames[3], ''), c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE) / length(frames[3]) ELSE 0.0 END, 6) AS feat2,
            |       round(CASE WHEN n_frames >= 4 THEN CAST(list_sum(list_transform(string_split(frames[4], ''), c -> CAST(ascii(c) AS BIGINT))) AS DOUBLE) / length(frames[4]) ELSE 0.0 END, 6) AS feat3
            |FROM h ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        lng(length(col("text"))).as("byte_len"))
        .as[Multimodal.MediaRow]
      Multimodal.featurize(media)
        .select(col("media_id"), col("modality"), col("byte_len"),
          col("n_frames"), col("frame_stride"), col("signature"),
          round(element_at(col("features"), 1), 6).as("feat0"),
          round(element_at(col("features"), 2), 6).as("feat1"),
          round(element_at(col("features"), 3), 6).as("feat2"),
          round(element_at(col("features"), 4), 6).as("feat3"))
        .orderBy("media_id")
    }
  )

  /** Audio-shaped multimodal CONTENT op (the q_multimodal_meta stub
    * convention: text bytes stand in for the opaque payload; a real
    * codec drops in behind graft.ops.Multimodal.Decoder with no plan
    * change). Per-media windowed energy is the first pass an audio
    * curation pipeline runs — silence trimming, clipping detection and
    * loudness bucketing all key off it.
    *
    * Scale: one mapPartitions batch pass over the payload column (the
    * JVM analogue of a Pandas-UDF mapInPandas loop), per-window
    * energies reduced executor-side to five integers per media row —
    * payloads never leave the scan stage, nothing is collected, and
    * the arithmetic is all-BIGINT so there is no float-parity surface
    * at all.
    */
  private val mediaEnergy = QueryDef(
    "q_media_energy",
    "Windowed signal energy over multimodal payloads: 40-byte windows " +
      "(stub PCM frames), energy = sum of (byte-32)^2 per window — 32 " +
      "is the payload's silence byte — reduced per media to window " +
      "count, total energy, peak energy and first peak window index.",
    Some("""WITH m AS (SELECT doc_id AS media_id, text,
           |         CAST(greatest((length(text)+39)//40, 1) AS BIGINT) AS nw FROM documents),
           |w AS (SELECT media_id, i AS win,
           |        CAST(list_sum(list_transform(string_split(substr(text, CAST(i*40+1 AS INT), 40), ''),
           |             c -> CAST((ascii(c)-32)*(ascii(c)-32) AS BIGINT))) AS BIGINT) AS energy
           |      FROM m, unnest(generate_series(0, CAST(nw-1 AS INT))) AS u(i)),
           |pk AS (SELECT media_id AS mid, CAST(count(*) AS BIGINT) AS n_windows,
           |         CAST(sum(energy) AS BIGINT) AS total_energy,
           |         CAST(max(energy) AS BIGINT) AS peak_energy
           |       FROM w GROUP BY 1)
           |SELECT mid AS media_id, n_windows, total_energy, peak_energy,
           |       CAST(min(w.win) AS BIGINT) AS peak_win
           |FROM pk JOIN w ON w.media_id = pk.mid AND w.energy = pk.peak_energy
           |GROUP BY 1,2,3,4 ORDER BY 1""".stripMargin),
    (s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        lng(length(col("text"))).as("byte_len"))
        .as[Multimodal.MediaRow]
      Multimodal.windowEnergy(media)
        .select(col("media_id"), col("n_windows"), col("total_energy"),
          col("peak_energy"), col("peak_win"))
        .orderBy("media_id")
    }
  )

  /** Image/video-shaped multimodal CONTENT op — the duplicate-frame
    * screen, PIXEL-TRUE since r15 (VERDICT r14 task #2): each media
    * payload is a REAL animated GIF89a (the [[graft.ops.Gif]] codec —
    * grayscale identity palette, 1–8 full-logical-screen 8×8 frames,
    * graphic-control extensions between them), decoded executor-side
    * by the multi-frame LZW decoder back to per-frame pixels; each
    * decoded frame reduces to an 8-bin luminance histogram. Planted
    * content: frame f's pixels are md5-48("id_cf_j") mod 256 where cf
    * collapses f onto f−1 whenever (id+f) % 4 == 0 — the planted
    * duplicate frames (exact repeats, L1 = 0) the screen exists to
    * catch (slideshows, frozen streams), closed-form so the DuckDB
    * oracle recomputes every histogram without a codec. Readouts:
    * adjacent-frame histogram L1 distances (dup pair = L1 ≤ 16, plus
    * the min) and mean frame entropy in exact integer ppb (the
    * q_perplexity ln-grid discipline — per-bin −p·ln p rounded once on
    * the 1e-9 grid from ≤64 distinct (count, 64) rationals, then
    * integer-summed).
    *
    * Scale: one mapPartitions batch pass (graft.ops.Multimodal
    * .frameHistogramsOf); per media the state is 8 ints × ≤8 frames
    * and payloads never leave the scan stage. The planted GIFs are a
    * build-once parquet fixture (r16) so the timed query prices the
    * DECODE, not the synthesis+encode of its own inputs.
    */
  private val frameHist = QueryDef(
    "q_frame_hist",
    "Duplicate-frame screen over REAL animated-GIF payloads decoded " +
      "back to per-frame pixels: 8-bin luminance histograms per " +
      "decoded 8x8 frame (planted closed-form pixels with exact-" +
      "repeat frames), adjacent-frame L1 distances (dup pair = L1 <= " +
      "16, plus the min), and mean frame entropy in exact integer ppb.",
    Some("""WITH m AS (SELECT doc_id AS media_id,
           |         CAST(1 + doc_id % 8 AS BIGINT) AS nf FROM documents),
           |fr AS (SELECT media_id, nf, f,
           |         f - CASE WHEN f > 0 AND (media_id + f) % 4 = 0 THEN 1 ELSE 0 END AS cf
           |       FROM m, unnest(generate_series(0, CAST(nf - 1 AS INT))) AS u(f)),
           |h AS (SELECT media_id, nf, f,
           |        list_transform(generate_series(0, 7), b -> CAST(len(list_filter(
           |          list_transform(generate_series(0, 63),
           |            j -> (CAST(concat('0x', substr(md5(concat(media_id, '_', cf, '_', j)), 1, 12)) AS BIGINT) % 256) // 32),
           |          v -> v = b)) AS BIGINT)) AS hist
           |      FROM fr),
           |e AS (SELECT media_id, nf, f, hist,
           |        CAST(list_sum(list_transform(hist, n -> CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
           |          ELSE CAST(round(-(CAST(n AS DOUBLE)/64)*ln(CAST(n AS DOUBLE)/64)*1e9) AS BIGINT) END)) AS BIGINT) AS ent_e9
           |      FROM h),
           |pairs AS (SELECT a.media_id,
           |            CAST(list_sum(list_transform(generate_series(1, 8),
           |              b -> abs(a.hist[b] - p.hist[b]))) AS BIGINT) AS l1
           |          FROM e a JOIN e p ON p.media_id = a.media_id AND p.f = a.f - 1),
           |agg AS (SELECT media_id, CAST(max(nf) AS BIGINT) AS n_frames,
           |          CAST(sum(ent_e9) // max(nf) AS BIGINT) AS mean_entropy_ppb
           |        FROM e GROUP BY 1),
           |pagg AS (SELECT media_id,
           |           CAST(count(*) FILTER (WHERE l1 <= 16) AS BIGINT) AS n_dup_pairs,
           |           CAST(min(l1) AS BIGINT) AS min_l1
           |         FROM pairs GROUP BY 1)
           |SELECT agg.media_id, agg.n_frames,
           |       CAST(COALESCE(pagg.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
           |       pagg.min_l1, agg.mean_entropy_ppb
           |FROM agg LEFT JOIN pagg USING (media_id) ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      // Planted payloads live in a BUILD-ONCE parquet fixture (VERDICT
      // r15 #3): the key exists to price the DECODE path, and r15's
      // in-query synthesis + LZW ENCODE of every GIF dominated the
      // timed row (~10 s, the heaviest media key). The build step is
      // deterministic in (sf, doc_ids) — the planted-twin discipline
      // allows it — and a real corpus's payloads arrive on disk too.
      val fixDir = s"/root/repo/target/media_framehist/${new java.io.File(d).getName}"
      val fixPath = new org.apache.hadoop.fs.Path(fixDir)
      val ffs = fixPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (!ffs.exists(new org.apache.hadoop.fs.Path(fixDir + "/_SUCCESS"))) {
        val build = documents(s, d).select(col("doc_id")).as[Long].map { id =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def px(cf: Int, j: Int): Int = {
            val hex = md.digest(s"${id}_${cf}_$j".getBytes("UTF-8"))
              .take(6).map(b => f"$b%02x").mkString
            (java.lang.Long.parseLong(hex, 16) % 256L).toInt
          }
          val nf = (1 + id % 8).toInt
          // planted duplicate frames: every (id+f) % 4 == 0 frame is an
          // exact repeat of its predecessor — the dup the screen
          // catches. Pixels materialize once per DISTINCT source frame
          val cfs = (0 until nf).map(f =>
            if (f > 0 && (id + f) % 4 == 0) f - 1 else f)
          val lut = cfs.distinct
            .map(cf => cf -> Array.tabulate(64)(j => px(cf, j))).toMap
          val frames = cfs.map { cf =>
            val a = lut(cf)
            (x: Int, y: Int) => a(y * 8 + x)
          }
          val payload = graft.ops.Gif.encodeFrames(8, 8, i => (i, i, i), frames)
          Multimodal.MediaRow(id, "video", payload, payload.length.toLong)
        }
        build.toDF().write.mode("overwrite").parquet(fixDir)
      }
      val media = s.read.parquet(fixDir).as[Multimodal.MediaRow]
      // decode: animated GIF -> per-frame 64-px luminance (identity
      // grayscale palette makes luminance == palette index exactly)
      val decodeLum = (payload: Array[Byte]) =>
        graft.ops.Gif.decodeFrames(payload).map { dec =>
          dec.rows.flatMap(_.grouped(3).map(p =>
            (299 * (p(0) & 0xff) + 587 * (p(1) & 0xff) +
              114 * (p(2) & 0xff)) / 1000)).toArray
        }
      Multimodal.frameHistogramsOf(media, decodeLum)
        .select(col("media_id"), col("n_frames"), col("n_dup_pairs"),
          col("min_l1"), col("mean_entropy_ppb"))
        .orderBy("media_id")
    }
  )

  /** Mojibake repair — the ftfy-shaped encoding-fix pass every web
    * corpus runs before tokenization: text that was UTF-8 on disk but
    * got decoded as Latin-1 somewhere upstream ("é" → "Ã©",
    * "…" → "â€¦") is repaired by the REAL generic inverse — re-encode
    * the garbled string as Latin-1 bytes and re-decode them as UTF-8
    * (`decode(encode(s, 'ISO-8859-1'), 'UTF-8')`) — not by a lookup
    * table of known sequences. Both directions run through Spark's
    * codegen'd encode/decode expressions.
    *
    * Planted-twin discipline (the corpus is pure ASCII — pinned in
    * MultimodalSpec — so the non-ASCII "intended" text is synthesized):
    * each doc gets a deterministic accented suffix (4 variants by
    * doc_id, covering 2-byte AND 3-byte UTF-8 code points), is
    * CORRUPTED by the actual UTF-8-bytes-read-as-Latin-1 double
    * decode, then repaired. The oracle states the SPEC in closed form
    * — intended/mojibake char lengths (each 2-byte char grows by 1,
    * 3-byte by 2), the 'Ã' marker count (first byte 0xC3 ⇔ planted
    * U+00C0–U+00FF), and repaired_ok = 1 — so any lossy step in the
    * encode→decode→encode→decode chain breaks the hash.
    *
    * Scale: pure per-row scan-stage expressions, no shuffle at all
    * before the final orderBy; at 100 TB this runs inside the same
    * whole-stage-codegen span as the scan.
    */
  private val fixEncoding = QueryDef(
    "q_fix_encoding",
    "Mojibake repair: planted accented suffixes corrupted by the real " +
      "UTF-8-read-as-Latin-1 double decode, repaired by the generic " +
      "Latin-1-bytes-as-UTF-8 inverse; char-length accounting, " +
      "mojibake marker counts and lossless-recovery flag out - the " +
      "oracle states the spec in closed form.",
    Some("""SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS variant,
           |       CAST(length(text) + CASE CAST(doc_id % 4 AS INT)
           |         WHEN 0 THEN 12 WHEN 1 THEN 13 WHEN 2 THEN 16 ELSE 14 END AS BIGINT) AS n_chars_intended,
           |       CAST(length(text) + CASE CAST(doc_id % 4 AS INT)
           |         WHEN 0 THEN 15 WHEN 1 THEN 15 WHEN 2 THEN 19 ELSE 19 END AS BIGINT) AS n_chars_mojibake,
           |       CAST(CASE CAST(doc_id % 4 AS INT)
           |         WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 1 ELSE 3 END AS BIGINT) AS n_moji_marks,
           |       CAST(1 AS BIGINT) AS repaired_ok
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val phrases = array(FixEncodingPhrases.map(lit): _*)
      documents(s, d)
        .withColumn("intended", concat(col("text"),
          element_at(phrases, (col("doc_id") % 4).cast("int") + 1)))
        .withColumn("moji",
          decode(encode(col("intended"), "UTF-8"), "ISO-8859-1"))
        .withColumn("repaired",
          decode(encode(col("moji"), "ISO-8859-1"), "UTF-8"))
        .select(col("doc_id"), lng(col("doc_id") % 4).as("variant"),
          lng(length(col("intended"))).as("n_chars_intended"),
          lng(length(col("moji"))).as("n_chars_mojibake"),
          lng(length(col("moji")) -
            length(expr("replace(moji, 'Ã', '')"))).as("n_moji_marks"),
          lng(when(col("repaired") === col("intended"), 1L).otherwise(0L))
            .as("repaired_ok"))
        .orderBy("doc_id")
    }
  )

  /** The planted suffixes for [[fixEncoding]] — 2-byte (é è ï ç ö û)
    * and 3-byte (— …) UTF-8 code points, 4 variants by doc_id % 4.
    * Shared with FixEncodingSpec's plain-Java recomputation.
    */
  val FixEncodingPhrases: Seq[String] = Seq(
    " café résumé", " naïve façade", " coördinate — ok", " crème brûlée…")

  /** Real-format media decode through the Multimodal seam — closes
    * the r8 verdict's "decode is stub-only" gap the way PdfPages
    * closed binary document ingestion: a dependency-free 24-bit BMP
    * parser ([[graft.ops.Bmp]]) runs as the [[Multimodal.Decoder]],
    * over REAL BMP bytes synthesized deterministically per document
    * (pixel (x,y) channels are fixed modular functions of doc_id — the
    * planted-twin discipline). The oracle computes the identical
    * readouts in CLOSED FORM from the pixel functions, so any
    * encode/decode defect that survives the round trip — row flip,
    * BGR/RGB confusion, padding leak, header misread — breaks the
    * position-weighted checksum. Mirrored encoder+decoder bugs (the
    * round-trip blind spot) are killed separately by BmpSpec's
    * hand-written golden bytes.
    *
    * Scale: encode and decode are per-row executor byte loops inside
    * one mapPartitions pass; payloads never leave the scan stage;
    * outputs are exact BIGINTs (sums ≤ 33M — no overflow surface).
    * Width 15 is chosen deliberately: 45 pixel bytes/row forces the
    * 4-byte row padding the format is notorious for.
    */
  private val mediaDecode = QueryDef(
    "q_media_decode",
    "Real 24-bit BMP decode through the Multimodal seam: per-document " +
      "synthesized BMP payloads (planted pixel functions), parsed by " +
      "the dependency-free header+pixel decoder; geometry, exact " +
      "channel sums and a position-weighted checksum out - the oracle " +
      "recomputes all of it in closed form from the pixel functions.",
    Some("""WITH px AS (
           |  SELECT doc_id, y, x,
           |    (doc_id * 7 + y * 16 + x) % 256 AS r,
           |    (doc_id * 13 + x * 3) % 256 AS g,
           |    (doc_id * 31 + y * 5) % 256 AS b
           |  FROM documents,
           |       unnest(generate_series(0, 7)) AS yy(y),
           |       unnest(generate_series(0, 14)) AS xx(x))
           |SELECT doc_id AS media_id, CAST(15 AS BIGINT) AS width,
           |       CAST(8 AS BIGINT) AS height, CAST(120 AS BIGINT) AS n_pixels,
           |       CAST(sum(r) AS BIGINT) AS sum_r,
           |       CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b,
           |       CAST(sum(((y*15 + x)*3 + 1) * r + ((y*15 + x)*3 + 2) * g
           |                + ((y*15 + x)*3 + 3) * b) AS BIGINT) AS checksum
           |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].map { id =>
        val payload = Bmp.encode24(15, 8, (x, y) => (
          ((id * 7 + y * 16 + x) % 256).toInt,
          ((id * 13 + x * 3) % 256).toInt,
          ((id * 31 + y * 5) % 256).toInt))
        Multimodal.MediaRow(id, "image", payload, payload.length.toLong)
      }
      Multimodal.decodeRgbReadout(media, Bmp.RowDecoder())
        .orderBy("media_id")
    }
  )

  /** Real RIFF/WAVE decode through the multimodal seam — the audio
    * twin of [[mediaDecode]] (q_media_decode proved the image path
    * with BMP; this proves the audio path with the other canonical
    * uncompressed public container). Each document synthesizes an
    * 80-sample mono PCM16 waveform from a planted integer sample
    * function, encodes it with the dependency-free writer (RIFF
    * header, fmt chunk, data chunk, even-byte chunk alignment), and
    * the parser walks the chunk list back to samples. The readout is
    * all exact integers — header metadata, signed/absolute sample
    * sums, peak amplitude, and the position-weighted checksum that
    * catches any reorder (endianness slip, chunk-offset error) — and
    * the oracle recomputes everything in closed form from the sample
    * function, so a decoder bug cannot hash-match. Encode/decode
    * round-trip blind spots are killed separately by WavSpec's golden
    * bytes and foreign-chunk fixtures.
    *
    * Scale: identical altitude to q_media_decode — one mapPartitions
    * batch pass, payloads never leave the scan stage.
    */
  private val wavDecode = QueryDef(
    "q_wav_decode",
    "Real RIFF/WAVE PCM16 decode through the multimodal seam: " +
      "per-document synthesized waveforms (planted sample function) " +
      "parsed by the dependency-free chunk-walking decoder; header " +
      "metadata, exact sample sums, peak and a position-weighted " +
      "checksum out — the oracle recomputes all of it in closed form.",
    Some("""WITH sm AS (
           |  SELECT doc_id, i,
           |    (doc_id * 37 + i * 13) % 4001 - 2000 AS v
           |  FROM documents, unnest(generate_series(0, 79)) AS ii(i))
           |SELECT doc_id AS media_id, CAST(8000 AS BIGINT) AS sample_rate,
           |       CAST(1 AS BIGINT) AS n_channels, CAST(80 AS BIGINT) AS n_samples,
           |       CAST(sum(v) AS BIGINT) AS sum_samples,
           |       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
           |       CAST(max(abs(v)) AS BIGINT) AS peak_abs,
           |       CAST(sum((i + 1) * v) AS BIGINT) AS checksum
           |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].map { id =>
        val samples = Array.tabulate(80) { i =>
          (((id * 37 + i * 13) % 4001) - 2000).toShort
        }
        val payload = Wav.encodePcm16(8000, 1, samples)
        Multimodal.MediaRow(id, "audio", payload, payload.length.toLong)
      }
      Multimodal.decodePcmReadout(media, Wav.decodePcm16)
        .orderBy("media_id")
    }
  )

  /** Real PNG decode through the multimodal seam — the third real
    * container behind the [[Multimodal.Decoder]] seam and the
    * lossless-COMPRESSED image corner BMP does not cover (VERDICT r10
    * #4): the pixel stream is a zlib deflate stream, decoded by the
    * same JDK Inflater machinery PdfPages uses for FlateDecode. Each
    * document synthesizes a 13x9 truecolor PNG from planted pixel
    * functions (distinct moduli from q_media_decode so the two image
    * paths cannot share a mirrored bug), and [[graft.ops.Png]] walks
    * signature -> CRC-checked chunks -> inflate -> de-filter back to
    * top-down RGB rows consumed by the SAME decodeRgbReadout as BMP —
    * geometry, exact channel sums, position-weighted checksum. The
    * oracle recomputes everything in closed form from the pixel
    * functions; encoder/decoder round-trip blind spots are killed by
    * PngSpec's golden bytes and compressed/filtered fixtures.
    *
    * Scale: identical altitude to q_media_decode — one mapPartitions
    * batch pass, payloads never leave the scan stage.
    */
  private val pngDecode = QueryDef(
    "q_png_decode",
    "Real PNG (8-bit RGB) decode through the multimodal seam: " +
      "per-document synthesized PNGs (planted pixel functions) parsed " +
      "by the dependency-free chunk-walking + zlib-inflating decoder; " +
      "geometry, exact channel sums and a position-weighted checksum " +
      "out - the oracle recomputes all of it in closed form.",
    Some("""WITH px AS (
           |  SELECT doc_id, y, x,
           |    (doc_id * 11 + y * 7 + x) % 256 AS r,
           |    (doc_id * 17 + x * 5) % 256 AS g,
           |    (doc_id * 23 + y * 9) % 256 AS b
           |  FROM documents,
           |       unnest(generate_series(0, 8)) AS yy(y),
           |       unnest(generate_series(0, 12)) AS xx(x))
           |SELECT doc_id AS media_id, CAST(13 AS BIGINT) AS width,
           |       CAST(9 AS BIGINT) AS height, CAST(117 AS BIGINT) AS n_pixels,
           |       CAST(sum(r) AS BIGINT) AS sum_r,
           |       CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b,
           |       CAST(sum(((y*13 + x)*3 + 1) * r + ((y*13 + x)*3 + 2) * g
           |                + ((y*13 + x)*3 + 3) * b) AS BIGINT) AS checksum
           |FROM px GROUP BY doc_id ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].map { id =>
        val payload = Png.encodeRgb8(13, 9, (x, y) => (
          ((id * 11 + y * 7 + x) % 256).toInt,
          ((id * 17 + x * 5) % 256).toInt,
          ((id * 23 + y * 9) % 256).toInt))
        Multimodal.MediaRow(id, "image", payload, payload.length.toLong)
      }
      Multimodal.decodeRgbReadout(media, Png.RowDecoder())
        .orderBy("media_id")
    }
  )

  /** Real baseline JPEG decode through the multimodal seam — the
    * LOSSY-compressed corner (VERDICT r12 #5) and the dominant image
    * container of any web-scale corpus; BMP covers raw, PNG covers
    * lossless deflate, this covers entropy-coded DCT with 4:2:0
    * chroma subsampling and restart markers, both exercised in every
    * payload (DRI=2 over 6 MCUs → two RSTn resyncs per image). Each
    * document synthesizes a 48×32 JPEG from planted BLOCK-CONSTANT
    * YCbCr functions (Y per 8×8 block, chroma per 16×16 MCU — the
    * shape the 2×2 subsampling reduces losslessly); with all-ones
    * quantization tables such plants survive the lossy pipeline
    * BIT-EXACTLY (constant blocks are DC-only spectra; Jpeg.scala doc
    * carries the proof), so the oracle states decoded RGB in closed
    * form — including the YCbCr→RGB conversion, written in one fixed
    * IEEE operation order in both engines. Geometry, exact channel
    * sums, position-weighted checksum out via the same
    * decodeRgbReadout as BMP/PNG. Codec blind spots (AC paths, byte
    * stuffing, DC-reset shear, progressive rejection) are killed by
    * JpegSpec.
    *
    * Scale: identical altitude to q_media_decode — one mapPartitions
    * batch pass, payloads never leave the scan stage.
    */
  private val jpegDecode = QueryDef(
    "q_jpeg_decode",
    "Real baseline JPEG (4:2:0, restart markers) decode through the " +
      "multimodal seam: per-document synthesized JPEGs from planted " +
      "block-constant YCbCr functions, parsed by the dependency-free " +
      "Huffman+IDCT decoder; geometry, exact channel sums and a " +
      "position-weighted checksum out — the oracle recomputes all of " +
      "it in closed form, color conversion included.",
    Some("""WITH px AS (
           |  SELECT doc_id, y, x,
           |    (doc_id * 19 + (y // 8) * 37 + (x // 8) * 53) % 256 AS yv,
           |    (doc_id * 29 + (x // 16) * 41) % 256 AS cb,
           |    (doc_id * 43 + (y // 16) * 31) % 256 AS cr
           |  FROM documents,
           |       unnest(generate_series(0, 31)) AS yy(y),
           |       unnest(generate_series(0, 47)) AS xx(x)),
           |rgb AS (
           |  SELECT doc_id, y, x,
           |    greatest(0, least(255, CAST(floor(yv + 1.402e0 * (cr - 128) + 0.5e0) AS BIGINT))) AS r,
           |    greatest(0, least(255, CAST(floor(yv - 0.344136e0 * (cb - 128) - 0.714136e0 * (cr - 128) + 0.5e0) AS BIGINT))) AS g,
           |    greatest(0, least(255, CAST(floor(yv + 1.772e0 * (cb - 128) + 0.5e0) AS BIGINT))) AS b
           |  FROM px)
           |SELECT doc_id AS media_id, CAST(48 AS BIGINT) AS width,
           |       CAST(32 AS BIGINT) AS height, CAST(1536 AS BIGINT) AS n_pixels,
           |       CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b,
           |       CAST(sum(((y*48 + x)*3 + 1) * r + ((y*48 + x)*3 + 2) * g
           |                + ((y*48 + x)*3 + 3) * b) AS BIGINT) AS checksum
           |FROM rgb GROUP BY doc_id ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].map { id =>
        val y = Array.tabulate(48 * 32) { i =>
          val yy = i / 48; val xx = i % 48
          ((id * 19 + (yy / 8) * 37 + (xx / 8) * 53) % 256).toInt
        }
        val cb = Array.tabulate(24 * 16) { i =>
          val xx = i % 24
          ((id * 29 + (xx / 8) * 41) % 256).toInt
        }
        val cr = Array.tabulate(24 * 16) { i =>
          val yy = i / 24
          ((id * 43 + (yy / 8) * 31) % 256).toInt
        }
        val payload = Jpeg.encode420(48, 32, y, cb, cr, restartInterval = 2)
        Multimodal.MediaRow(id, "image", payload, payload.length.toLong)
      }
      Multimodal.decodeRgbReadout(media, Jpeg.RowDecoder())
        .orderBy("media_id")
    }
  )

  /** Real GIF (palette + LZW) decode through the multimodal seam —
    * the fifth real codec and the container class the others miss:
    * BMP is raw truecolor, PNG filtered deflate, JPEG lossy DCT
    * (baseline + progressive), WAV PCM; GIF is indexed color through
    * a variable-width LZW stream packed LSB-FIRST (the others pack
    * MSB-first). Payloads synthesize from planted palette + index
    * functions; the decode is lossless, so the oracle recomputes the
    * palette lookup in closed form. GifSpec kills the codec blind
    * spots the constant oracle can't reach (code-width growth across
    * 9→12 bits with the spec-appendix off-by-one, KwKwK, table-full
    * CLEAR/reset, truncation rejection).
    *
    * Scale: identical altitude to q_media_decode — one mapPartitions
    * batch pass, payloads never leave the scan stage.
    */
  private val gifDecode = QueryDef(
    "q_gif_decode",
    "Real GIF89a (256-color palette, variable-width LZW) decode " +
      "through the multimodal seam: per-document synthesized GIFs " +
      "from planted palette + index functions, parsed by the " +
      "dependency-free LZW decoder; geometry, exact channel sums and " +
      "a position-weighted checksum out — the oracle recomputes the " +
      "lossless palette lookup in closed form.",
    Some("""WITH px AS (
           |  SELECT doc_id, y, x,
           |    (doc_id * 13 + x * 17 + y * 23) % 256 AS i
           |  FROM documents,
           |       unnest(generate_series(0, 15)) AS yy(y),
           |       unnest(generate_series(0, 23)) AS xx(x)),
           |rgb AS (
           |  SELECT doc_id, y, x,
           |    (i * 7) % 256 AS r, (i * 13) % 256 AS g, (i * 29) % 256 AS b
           |  FROM px)
           |SELECT doc_id AS media_id, CAST(24 AS BIGINT) AS width,
           |       CAST(16 AS BIGINT) AS height, CAST(384 AS BIGINT) AS n_pixels,
           |       CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b,
           |       CAST(sum(((y*24 + x)*3 + 1) * r + ((y*24 + x)*3 + 2) * g
           |                + ((y*24 + x)*3 + 3) * b) AS BIGINT) AS checksum
           |FROM rgb GROUP BY doc_id ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].map { id =>
        val payload = Gif.encode8(24, 16,
          i => ((i * 7) % 256, (i * 13) % 256, (i * 29) % 256),
          (x, y) => ((id * 13 + x * 17 + y * 23) % 256).toInt)
        Multimodal.MediaRow(id, "image", payload, payload.length.toLong)
      }
      Multimodal.decodeRgbReadout(media, Gif.RowDecoder())
        .orderBy("media_id")
    }
  )

  /** Interlaced real-world image variants through ONE sniffing decode
    * seam (VERDICT r15 #4 — the last loud rejects on the web-image
    * surface): per document an INTERLACED GIF with a LOCAL color
    * table and no global one (the multi-image web-GIF layout; rows
    * stored in the 4-pass 0/4/2/1 schedule) and an ADAM7 PNG (the
    * progressive-render layout; seven independently-filtered passes
    * scattered on decode), both routed by magic through
    * Multimodal.ImageRowDecoder — the mixed-container column shape a
    * real corpus has. Both codecs are lossless, so the oracle states
    * the de-interlaced pixels in closed form; a decoder that ignored
    * the interlace flag (rows permuted) or misread the local palette
    * shifts the position-weighted checksum and fails the hash.
    * GifSpec/PngSpec kill the sub-cases (odd heights, empty Adam7
    * passes, local-vs-global precedence, flag honored not ignored).
    *
    * Scale: identical altitude to q_media_decode — one mapPartitions
    * batch pass, payloads never leave the scan stage.
    */
  private val mediaInterlace = QueryDef(
    "q_media_interlace",
    "Interlaced web-image variants through the sniffing decode seam: " +
      "per document an interlaced local-palette GIF (4-pass row " +
      "schedule, no global table) and an Adam7 PNG (7 scattered " +
      "passes), each decoded by the magic-routed image decoder; " +
      "geometry, exact channel sums and a position-weighted checksum " +
      "out — the oracle recomputes the de-interlaced pixels in closed " +
      "form.",
    Some("""WITH gifpx AS (
           |  SELECT doc_id, y, x,
           |    (doc_id * 7 + x * 13 + y * 31) % 256 AS i
           |  FROM documents,
           |       unnest(generate_series(0, 15)) AS yy(y),
           |       unnest(generate_series(0, 23)) AS xx(x)),
           |gif AS (
           |  SELECT doc_id * 2 AS media_id, 24 AS w, 16 AS h, y, x,
           |         (i * 5) % 256 AS r, (i * 11) % 256 AS g,
           |         (i * 19) % 256 AS b
           |  FROM gifpx),
           |png AS (
           |  SELECT doc_id * 2 + 1 AS media_id, 13 AS w, 9 AS h, y, x,
           |         (doc_id * 3 + x * 11 + y * 5) % 256 AS r,
           |         (doc_id * 7 + y * 13) % 256 AS g,
           |         (doc_id * 11 + x * 17) % 256 AS b
           |  FROM documents,
           |       unnest(generate_series(0, 8)) AS yy(y),
           |       unnest(generate_series(0, 12)) AS xx(x)),
           |px AS (SELECT * FROM gif UNION ALL SELECT * FROM png)
           |SELECT media_id, CAST(w AS BIGINT) AS width,
           |       CAST(h AS BIGINT) AS height,
           |       CAST(w * h AS BIGINT) AS n_pixels,
           |       CAST(sum(r) AS BIGINT) AS sum_r,
           |       CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b,
           |       CAST(sum(((y*w + x)*3 + 1) * r + ((y*w + x)*3 + 2) * g
           |                + ((y*w + x)*3 + 3) * b) AS BIGINT) AS checksum
           |FROM px GROUP BY media_id, w, h ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].flatMap { id =>
        val gif = Gif.encodeGif(24, 16, None,
          Seq(Gif.Frame(
            (x, y) => ((id * 7 + x * 13 + y * 31) % 256).toInt,
            localPalette = Some(i =>
              ((i * 5) % 256, (i * 11) % 256, (i * 19) % 256)),
            interlaced = true)))
        val png = Png.encodeRgb8Adam7(13, 9, (x, y) => (
          ((id * 3 + x * 11 + y * 5) % 256).toInt,
          ((id * 7 + y * 13) % 256).toInt,
          ((id * 11 + x * 17) % 256).toInt))
        Seq(
          Multimodal.MediaRow(id * 2, "image", gif, gif.length.toLong),
          Multimodal.MediaRow(id * 2 + 1, "image", png, png.length.toLong))
      }
      Multimodal.decodeRgbReadout(media, Multimodal.ImageRowDecoder())
        .orderBy("media_id")
    }
  )

  /** Partial-frame animated-GIF COMPOSITING (r16 — the dominant real
    * animated-GIF layout: only the changed rectangle is stored per
    * frame): each document's payload is a 3-frame GIF — a full-screen
    * base, a partial opaque overlay with DISPOSAL 2 (its region
    * restores to the background color before the next frame), and a
    * partial TRANSPARENT-checker overlay (transparent pixels leave the
    * canvas) — and the decoder emits logical-screen-sized canvas
    * SNAPSHOTS per frame. Everything is lossless and the compositing
    * rules are pure case analysis on (x, y, frame), so the oracle
    * states every composited pixel in closed form; a decoder that
    * ignored the region offset, the disposal, or the transparency
    * moves the per-frame position-weighted checksum and fails the
    * hash. GifSpec pins disposal 3 (restore-to-previous) and the
    * region-bounds reject the oracle can't reach.
    *
    * Scale: identical altitude to q_frame_hist — one mapPartitions
    * batch pass, payloads never leave the scan stage.
    */
  private val gifAnim = QueryDef(
    "q_gif_anim",
    "Partial-frame animated-GIF compositing: 3-frame payloads (full " +
      "base, disposal-2 opaque overlay, transparent-checker overlay) " +
      "decoded to logical-screen canvas snapshots; per (media, frame) " +
      "geometry, exact channel sums and a position-weighted checksum " +
      "— the oracle recomputes every composited pixel in closed form.",
    Some("""WITH px AS (
           |  SELECT doc_id, f, y, x,
           |    CASE
           |      WHEN f = 0 THEN (doc_id * 3 + x + y * 7) % 256
           |      WHEN f = 1 THEN
           |        CASE WHEN x >= 3 AND x < 8 AND y >= 2 AND y < 6 THEN 200
           |             ELSE (doc_id * 3 + x + y * 7) % 256 END
           |      ELSE
           |        CASE WHEN x >= 6 AND x < 10 AND y >= 5 AND y < 8
           |                  AND ((x - 6) + (y - 5)) % 2 = 1 THEN 90
           |             WHEN x >= 3 AND x < 8 AND y >= 2 AND y < 6 THEN 0
           |             ELSE (doc_id * 3 + x + y * 7) % 256 END
           |    END AS i
           |  FROM documents,
           |       unnest(generate_series(0, 2)) AS ff(f),
           |       unnest(generate_series(0, 9)) AS yy(y),
           |       unnest(generate_series(0, 11)) AS xx(x)),
           |rgb AS (
           |  SELECT doc_id, f, y, x,
           |    (i * 5) % 256 AS r, (i * 11) % 256 AS g, (i * 19) % 256 AS b
           |  FROM px)
           |SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame,
           |       CAST(12 AS BIGINT) AS width, CAST(10 AS BIGINT) AS height,
           |       CAST(sum(r) AS BIGINT) AS sum_r,
           |       CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b,
           |       CAST(sum(((y*12 + x)*3 + 1) * r + ((y*12 + x)*3 + 2) * g
           |                + ((y*12 + x)*3 + 3) * b) AS BIGINT) AS checksum
           |FROM rgb GROUP BY doc_id, f ORDER BY media_id, frame""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].map { id =>
        def base(x: Int, y: Int): Int = ((id * 3 + x + y * 7) % 256).toInt
        val payload = Gif.encodeGif(12, 10,
          Some(i => ((i * 5) % 256, (i * 11) % 256, (i * 19) % 256)),
          Seq(
            Gif.Frame(base),
            Gif.Frame((_, _) => 200, region = Some((3, 2, 5, 4)),
              disposal = 2),
            Gif.Frame((x, y) => if ((x + y) % 2 == 0) 7 else 90,
              region = Some((6, 5, 4, 3)), transparent = Some(7))))
        Multimodal.MediaRow(id, "video", payload, payload.length.toLong)
      }
      Multimodal.decodeRgbFramesReadout(media,
        p => Gif.decodeFrames(p).map(dd => (dd.width, dd.height, dd.rows)))
        .orderBy("media_id", "frame")
    }
  )

  /** Real PROGRESSIVE JPEG decode through the multimodal seam —
    * completing VERDICT r13 #10 past the sniff-and-route triage:
    * web corpora are ~10–20% progressive (SOF2), and a pipeline that
    * only routes them around a baseline decoder still drops them on
    * the floor. Payloads are synthesized by `Jpeg.encodeProgressive420`
    * — the libjpeg standard 10-scan script (interleaved DC first scan
    * at Al=1 + DC refinement, per-component AC spectral-selection
    * scans, AC successive-approximation refinement, EOB-run
    * accumulation with buffered correction bits, per-scan OPTIMIZED
    * Huffman tables per T.81 Annex K.2) — and decoded by the same
    * general decoder, which accumulates all ten scans into a
    * persistent coefficient store before one shared dequantize/IDCT.
    *
    * The closed-form-oracle argument is q_jpeg_decode's, carried
    * through successive approximation: block-constant plants are
    * DC-only spectra, the DC scans transmit dc>>1 then the refinement
    * bit (arithmetic shift + OR reassemble losslessly), every AC scan
    * codes pure EOB runs, so decoded RGB is exactly the planted
    * YCbCr through the fixed-order color chain. JpegSpec pins the
    * stronger property on full-energy images: progressive == baseline
    * decode BIT-FOR-BIT (identical coefficients, different entropy
    * coding), killing every AC first/refine blind spot the constant
    * plants cannot reach.
    *
    * Scale: identical altitude to q_jpeg_decode — one mapPartitions
    * batch pass, payloads never leave the scan stage.
    */
  private val jpegProgressive = QueryDef(
    "q_jpeg_progressive",
    "Real progressive JPEG (SOF2, 10-scan successive approximation + " +
      "spectral selection, per-scan optimized Huffman tables) decode " +
      "through the multimodal seam: per-document synthesized " +
      "progressive JPEGs from planted block-constant YCbCr functions, " +
      "accumulated scan-by-scan into the coefficient store and " +
      "reconstructed once; geometry, exact channel sums and a " +
      "position-weighted checksum out — the oracle recomputes all of " +
      "it in closed form, color conversion included.",
    Some("""WITH px AS (
           |  SELECT doc_id, y, x,
           |    (doc_id * 23 + (y // 8) * 41 + (x // 8) * 59) % 256 AS yv,
           |    (doc_id * 31 + (x // 16) * 43) % 256 AS cb,
           |    (doc_id * 47 + (y // 16) * 37) % 256 AS cr
           |  FROM documents,
           |       unnest(generate_series(0, 31)) AS yy(y),
           |       unnest(generate_series(0, 47)) AS xx(x)),
           |rgb AS (
           |  SELECT doc_id, y, x,
           |    greatest(0, least(255, CAST(floor(yv + 1.402e0 * (cr - 128) + 0.5e0) AS BIGINT))) AS r,
           |    greatest(0, least(255, CAST(floor(yv - 0.344136e0 * (cb - 128) - 0.714136e0 * (cr - 128) + 0.5e0) AS BIGINT))) AS g,
           |    greatest(0, least(255, CAST(floor(yv + 1.772e0 * (cb - 128) + 0.5e0) AS BIGINT))) AS b
           |  FROM px)
           |SELECT doc_id AS media_id, CAST(48 AS BIGINT) AS width,
           |       CAST(32 AS BIGINT) AS height, CAST(1536 AS BIGINT) AS n_pixels,
           |       CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b,
           |       CAST(sum(((y*48 + x)*3 + 1) * r + ((y*48 + x)*3 + 2) * g
           |                + ((y*48 + x)*3 + 3) * b) AS BIGINT) AS checksum
           |FROM rgb GROUP BY doc_id ORDER BY media_id""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val media = documents(s, d).select(col("doc_id")).as[Long].map { id =>
        val y = Array.tabulate(48 * 32) { i =>
          val yy = i / 48; val xx = i % 48
          ((id * 23 + (yy / 8) * 41 + (xx / 8) * 59) % 256).toInt
        }
        val cb = Array.tabulate(24 * 16) { i =>
          val xx = i % 24
          ((id * 31 + (xx / 8) * 43) % 256).toInt
        }
        val cr = Array.tabulate(24 * 16) { i =>
          val yy = i / 24
          ((id * 47 + (yy / 8) * 37) % 256).toInt
        }
        val payload = Jpeg.encodeProgressive420(48, 32, y, cb, cr)
        Multimodal.MediaRow(id, "image", payload, payload.length.toLong)
      }
      Multimodal.decodeRgbReadout(media, Jpeg.RowDecoder())
        .orderBy("media_id")
    }
  )

  /** Magic-byte container triage over a mixed media landing zone —
    * the routing pass that runs BEFORE q_media_decode/q_wav_decode
    * ever see a payload: real BMP, WAV and PNG payloads (the same
    * three encoders the decode queries exercise — PNG's byte length
    * is closed-form because the writer emits stored-block zlib),
    * %PDF-stamped blobs, and junk, interleaved by doc_id, sniffed
    * from fixed header prefixes only and counted per (source,
    * detected format). The planted-twin
    * oracle recomputes the routing in closed form from the plant, so
    * a sniffer that misroutes (or a byte-length drift in either real
    * encoder) breaks the hash. The junk payloads use CONSECUTIVE byte
    * values, which no supported magic contains — they cannot
    * accidentally match.
    *
    * Scale: sniffing reads ≤ 12 header bytes per payload in one
    * mapPartitions pass; payloads never leave the scan stage.
    */
  private val mediaSniff = QueryDef(
    "q_media_sniff",
    "Magic-byte format detection over a planted mixed media column " +
      "(real BMP, WAV, PNG, %PDF blob, GIF, baseline-JPEG and " +
      "progressive-JPEG headers, junk by doc_id mod 7): per (source, " +
      "detected format) counts and byte totals, sniffed from header " +
      "prefixes only — the catalog triage before any decode. JPEGs " +
      "are frame-typed by a bounded marker walk to the first SOF " +
      "(SOF0/1 baseline vs SOF2 progressive — the split that keeps " +
      "progressive files away from the baseline-only decoder).",
    Some("""SELECT source,
           |       CASE doc_id % 8 WHEN 0 THEN 'image/bmp'
           |                       WHEN 1 THEN 'audio/wav'
           |                       WHEN 2 THEN 'application/pdf'
           |                       WHEN 4 THEN 'image/png'
           |                       WHEN 5 THEN 'image/jpeg'
           |                       WHEN 6 THEN 'image/jpeg;progressive'
           |                       WHEN 7 THEN 'image/gif'
           |                       ELSE 'unknown' END AS format,
           |       CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CASE doc_id % 8 WHEN 0 THEN 78
           |                                WHEN 1 THEN 64
           |                                WHEN 2 THEN 9 + doc_id % 32
           |                                WHEN 4 THEN 88
           |                                WHEN 5 THEN 21 + doc_id % 16
           |                                WHEN 6 THEN 21 + doc_id % 16
           |                                WHEN 7 THEN 6 + doc_id % 16
           |                                ELSE 16 END) AS BIGINT) AS total_bytes
           |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      // closed-form 21-byte JPEG header chain (SOI + APP0(len 4) +
      // SOF(len 11)) + id-sized filler: the marker WALK is what's
      // under test (APP0 must be skipped to reach the SOF), and the
      // oracle needs the byte length in closed form
      def jpegHeader(id: Long, sof: Int): Array[Byte] = {
        val b = Array.newBuilder[Byte]
        b ++= Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46).map(_.toByte)
        b ++= Array(0xff, sof, 0x00, 0x0b, 0x08, 0x00, 0x20, 0x00,
          0x30, 0x03, 0x01, 0x02, 0x03).map(_.toByte)
        b ++= Array.tabulate((id % 16).toInt)(i => ((id + i) % 251).toByte)
        b.result()
      }
      val media = documents(s, d).select(col("doc_id"), col("source"))
        .as[(Long, String)].map { case (id, src) =>
          val payload: Array[Byte] = (id % 8) match {
            case 0 => Bmp.encode24(4, 2, (x, y) => (
              ((id + x) % 256).toInt, ((id + y) % 256).toInt, (id % 256).toInt))
            case 1 => Wav.encodePcm16(8000, 1,
              Array.tabulate(10)(i => ((id * 7 + i) % 100).toShort))
            case 2 => "%PDF-1.4\n".getBytes("US-ASCII") ++
              Array.tabulate((id % 32).toInt)(i => ((id + i) % 251).toByte)
            // 3x2 RGB: closed-form 88 bytes (Png.encodedLen(3, 2))
            case 4 => Png.encodeRgb8(3, 2, (x, y) => (
              ((id + x) % 256).toInt, ((id + y) % 256).toInt, (id % 256).toInt))
            case 5 => jpegHeader(id, 0xc0)
            case 6 => jpegHeader(id, 0xc2)
            // GIF magic + id-sized filler: sniffing reads 6 bytes, the
            // oracle needs the byte length in closed form
            case 7 => "GIF89a".getBytes("US-ASCII") ++
              Array.tabulate((id % 16).toInt)(i => ((id + i) % 251).toByte)
            case _ => Array.tabulate(16)(i => ((id + i) % 251).toByte)
          }
          (id, src, payload)
        }
      media.mapPartitions { it =>
        it.map { case (_, src, payload) =>
          (src, Multimodal.detectFormat(payload), payload.length.toLong)
        }
      }.toDF("source", "format", "bytes")
        .groupBy("source", "format")
        .agg(lng(count(lit(1))).as("n"), lng(sum("bytes")).as("total_bytes"))
        .orderBy("source", "format")
    }
  )

  /** Tokenizer fertility by language — tokens-per-word, the standard
    * multilingual tokenizer-quality metric (high fertility = the
    * tokenizer fragments that language, inflating training cost and
    * degrading quality). Uses the q_token_count conventions: words =
    * letter-run tokens, token estimate = the (len+3) DIV 4 BPE-ish
    * proxy. One map-side-combined groupBy on the language key; counts
    * are exact BIGINTs, the two ratios are single int64→double
    * divisions.
    */
  private val fertility = QueryDef(
    "q_fertility",
    "Tokenizer fertility per language: document/word/estimated-token " +
      "counts and tokens-per-word + chars-per-token ratios from one " +
      "scan-stage aggregation over the corpus.",
    Some("""SELECT lang,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(len(regexp_extract_all(lower(text), '([a-z]+)', 1))) AS BIGINT) AS n_words,
           |       CAST(sum((length(text) + 3) // 4) AS BIGINT) AS n_tokens,
           |       round(CAST(sum((length(text) + 3) // 4) AS DOUBLE)
           |             / sum(len(regexp_extract_all(lower(text), '([a-z]+)', 1))), 6) AS fertility,
           |       round(CAST(sum(length(text)) AS DOUBLE)
           |             / sum((length(text) + 3) // 4), 6) AS chars_per_token
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    (s, d) => documents(s, d)
      .groupBy("lang")
      .agg(lng(count(lit(1))).as("n_docs"),
        lng(sum(size(expr("regexp_extract_all(lower(text), '([a-z]+)', 1)"))))
          .as("n_words"),
        lng(sum(expr("(length(text) + 3) DIV 4"))).as("n_tokens"),
        round(dbl(sum(expr("(length(text) + 3) DIV 4")))
          / sum(size(expr("regexp_extract_all(lower(text), '([a-z]+)', 1)"))), 6)
          .as("fertility"),
        round(dbl(sum(length(col("text"))))
          / sum(expr("(length(text) + 3) DIV 4")), 6).as("chars_per_token"))
      .orderBy("lang")
  )

  private val textClean = QueryDef(
    "q_text_clean",
    "Corpus normalization (the standard pre-training cleaning pass): " +
      "lowercase, strip non-alphanumerics, collapse whitespace runs, " +
      "trim — one codegen'd projection, no shuffle before the oracle " +
      "orderBy. Reports before/after lengths so the reduction is " +
      "auditable.",
    Some("""SELECT doc_id,
           |       CAST(length(text) AS BIGINT) AS raw_len,
           |       CAST(length(cleaned) AS BIGINT) AS clean_len,
           |       md5(cleaned) AS digest
           |FROM (
           |  SELECT doc_id, text,
           |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS cleaned
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d)
      .withColumn("cleaned",
        trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
      .select(col("doc_id"),
        lng(length(col("text"))).as("raw_len"),
        lng(length(col("cleaned"))).as("clean_len"),
        md5(col("cleaned")).as("digest"))
      .orderBy("doc_id")
  )

  private val piiRedact = QueryDef(
    "q_pii_redact",
    "PII redaction (training corpora must not leak contact data): " +
      "deterministic synthetic emails/phones/ids are injected per doc " +
      "(the corpus itself is clean), then regex-redacted to typed " +
      "placeholders; the query reports per-doc redaction counts and the " +
      "redacted digest. Patterns are plain POSIX classes so both " +
      "engines' regex dialects agree.",
    Some("""WITH t AS (
           |  SELECT doc_id,
           |         text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           |         '@mail.example.com or +1-555-010' || CAST(doc_id % 10 AS VARCHAR) ||
           |         ' ssn 123-45-678' || CAST(doc_id % 10 AS VARCHAR) AS dirty
           |  FROM documents),
           |r AS (
           |  SELECT doc_id, dirty,
           |    regexp_replace(regexp_replace(regexp_replace(dirty,
           |      '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+', '<EMAIL>', 'g'),
           |      '[+][0-9]+-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
           |      '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS clean
           |  FROM t)
           |SELECT doc_id,
           |       CAST(len(regexp_extract_all(dirty, '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+')) AS BIGINT) AS n_email,
           |       CAST(len(regexp_extract_all(dirty, '[+][0-9]+-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
           |       CAST(length(clean) AS BIGINT) AS clean_len,
           |       md5(clean) AS digest
           |FROM r ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val dirtyCol = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com or +1-555-010"), (col("doc_id") % 10).cast("string"),
        lit(" ssn 123-45-678"), (col("doc_id") % 10).cast("string"))
      documents(s, d)
        .withColumn("dirty", dirtyCol)
        .withColumn("clean",
          regexp_replace(regexp_replace(regexp_replace(col("dirty"),
            "[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+", "<EMAIL>"),
            "[+][0-9]+-[0-9]{3}-[0-9]{4}", "<PHONE>"),
            "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"))
        .select(col("doc_id"),
          lng(size(expr("regexp_extract_all(dirty, '[a-z0-9._]+@[a-z0-9.-]+[.][a-z]+', 0)"))).as("n_email"),
          lng(size(expr("regexp_extract_all(dirty, '[+][0-9]+-[0-9]{3}-[0-9]{4}', 0)"))).as("n_phone"),
          lng(length(col("clean"))).as("clean_len"),
          md5(col("clean")).as("digest"))
        .orderBy("doc_id")
    }
  )

  private val repetition = QueryDef(
    "q_repetition",
    "Gopher-style repetition filter signals: per document, the " +
      "fraction of tokens claimed by the most frequent word and by the " +
      "most frequent bigram, plus the repetitive flag (top bigram > " +
      "18% of bigrams). Both explodes run inside the scan stage and " +
      "reduce to per-(doc, term) counts with map-side combine before " +
      "the per-doc max — never a per-doc sort. Fractions are one IEEE " +
      "division of exact BIGINTs.",
    Some("""WITH tok AS (SELECT doc_id,
           |               regexp_extract_all(lower(text), '([a-z]+)', 1) AS t
           |             FROM documents),
           |w AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n,
           |             CAST(sum(c) AS BIGINT) AS n_tokens
           |      FROM (SELECT doc_id, count(*) AS c
           |            FROM (SELECT doc_id, unnest(t) AS word FROM tok)
           |            GROUP BY doc_id, word)
           |      GROUP BY doc_id),
           |b AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n,
           |             CAST(sum(c) AS BIGINT) AS n_bigrams
           |      FROM (SELECT doc_id, count(*) AS c
           |            FROM (SELECT doc_id,
           |                    unnest([array_to_string(t[i:i+1], ' ')
           |                            for i in range(1, len(t))]) AS bg
           |                  FROM tok WHERE len(t) >= 2)
           |            GROUP BY doc_id, bg)
           |      GROUP BY doc_id)
           |SELECT w.doc_id, w.n_tokens,
           |       round(CAST(w.top_word_n AS DOUBLE) / w.n_tokens, 6) AS top_word_frac,
           |       round(CAST(b.top_bigram_n AS DOUBLE) / b.n_bigrams, 6) AS top_bigram_frac,
           |       (CAST(b.top_bigram_n AS DOUBLE) / b.n_bigrams > 0.18) AS repetitive
           |FROM w JOIN b ON b.doc_id = w.doc_id
           |ORDER BY w.doc_id""".stripMargin),
    (s, d) => {
      val tok = documents(s, d).select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)").as("t"))
      val w = tok.select(col("doc_id"), explode(col("t")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(lng(max(col("c"))).as("top_word_n"),
          lng(sum(col("c"))).as("n_tokens"))
      val b = tok.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> concat_ws(' ', slice(t, i, 2)))")).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(lng(max(col("c"))).as("top_bigram_n"),
          lng(sum(col("c"))).as("n_bigrams"))
      val bgFrac = dbl(col("top_bigram_n")) / col("n_bigrams")
      w.join(b, "doc_id")
        .select(col("doc_id"), col("n_tokens"),
          round(dbl(col("top_word_n")) / col("n_tokens"), 6).as("top_word_frac"),
          round(bgFrac, 6).as("top_bigram_frac"),
          (bgFrac > 0.18).as("repetitive"))
        .orderBy("doc_id")
    }
  )

  private val charDiversity = QueryDef(
    "q_char_diversity",
    "Character-diversity quality signals, all rational (no entropy " +
      "logarithm — ln is banned by float-parity rules; Simpson's " +
      "index 1 - Σc²/n² ranks low-diversity junk the same way): per " +
      "document, letter count, distinct letters, Simpson diversity " +
      "and the top-letter fraction. Letter explode runs inside the " +
      "scan stage; per-(doc, letter) counts reduce with map-side " +
      "combine; the fractions leave the plan as exact integer " +
      "parts-per-million (BIGINT floor division — a ratio like " +
      "149882/160000 lands exactly on a 1e-6 rounding midpoint, where " +
      "double round() ties break differently across engines; integer " +
      "arithmetic has no ties).",
    Some("""WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '([a-z])', 1)) AS c
           |            FROM documents),
           |cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2)
           |SELECT doc_id,
           |       CAST(sum(n) AS BIGINT) AS n_letters,
           |       CAST(count(*) AS BIGINT) AS n_distinct,
           |       CAST((sum(n) * sum(n) - sum(n * n)) * 1000000
           |            // (sum(n) * sum(n)) AS BIGINT) AS simpson_ppm,
           |       CAST(max(n) * 1000000 // sum(n) AS BIGINT) AS top_frac_ppm
           |FROM cc GROUP BY doc_id HAVING sum(n) > 0
           |ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '([a-z])', 1)")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(lng(sum(col("n"))).as("n_letters"),
        lng(count(lit(1))).as("n_distinct"),
        sum(col("n") * col("n")).as("s2"),
        lng(max(col("n"))).as("mx"))
      .filter(col("n_letters") > 0)
      .select(col("doc_id"), col("n_letters"), col("n_distinct"),
        lng(expr("(n_letters * n_letters - s2) * 1000000L div (n_letters * n_letters)"))
          .as("simpson_ppm"),
        lng(expr("mx * 1000000L div n_letters")).as("top_frac_ppm"))
      .orderBy("doc_id")
  )

  /** HTML text extraction — the web-corpus ingestion step (the
    * Common-Crawl shape: markup → training text). The corpus has no
    * raw HTML, so — the planted-twin discipline — each document is
    * wrapped in deterministic markup IN-QUERY (head with style/script
    * blocks, entity-bearing title, h1, per-sentence paragraph tags,
    * footer) and the extractor must strip it back: drop the head
    * subtree, strip tags, decode entities (&amp; last, per the
    * standard), collapse whitespace. The spec closes the loop by
    * asserting the ORIGINAL text is recovered verbatim between the h1
    * and footer fragments — the extractor is proven lossless on body
    * text, not just plausible. Pure per-row scan work, zero shuffles;
    * at 100 TB this is the embarrassingly-parallel first pass.
    */
  private val htmlStrip = QueryDef(
    "q_html_strip",
    "HTML → text extraction: head-subtree drop, tag strip, entity " +
      "decode, whitespace collapse, with markup/text length ratio — " +
      "the web-ingestion first pass, proven lossless by the spec's " +
      "exact recovery assertion.",
    Some("""WITH h AS (SELECT doc_id, text AS orig,
           |  '<html><head><title>doc ' || doc_id || ' &quot;' || source || '&quot;</title><style>p{margin:0}</style><script>var x=1 &lt; 2;</script></head><body><h1>' || upper(substr(text, 1, 16)) || '</h1><p>' || replace(text, '. ', '.</p><p>') || '</p><footer>&amp; more</footer></body></html>' AS html
           |  FROM documents),
           |s1 AS (SELECT doc_id, html, regexp_replace(html, '<head>.*</head>', ' ', 'g') AS x FROM h),
           |s2 AS (SELECT doc_id, html, regexp_replace(x, '<[^>]*>', ' ', 'g') AS x FROM s1),
           |s3 AS (SELECT doc_id, html,
           |  replace(replace(replace(replace(x, '&quot;', '"'), '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS x FROM s2),
           |s4 AS (SELECT doc_id, html, trim(regexp_replace(x, ' +', ' ', 'g')) AS clean FROM s3)
           |SELECT doc_id, CAST(length(html) AS BIGINT) AS html_len,
           |       CAST(length(clean) AS BIGINT) AS clean_len,
           |       round(CAST(length(clean) AS DOUBLE) / length(html), 6) AS text_ratio, clean
           |FROM s4 ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d)
      .withColumn("html", expr(
        """concat('<html><head><title>doc ', doc_id, ' &quot;', source,
          |'&quot;</title><style>p{margin:0}</style><script>var x=1 &lt; 2;</script></head><body><h1>',
          |upper(substring(text, 1, 16)), '</h1><p>',
          |replace(text, '. ', '.</p><p>'), '</p><footer>&amp; more</footer></body></html>')""".stripMargin))
      .withColumn("x", regexp_replace(col("html"), "<head>.*</head>", " "))
      .withColumn("x", regexp_replace(col("x"), "<[^>]*>", " "))
      .withColumn("x", expr(
        "replace(replace(replace(replace(x, '&quot;', '\"'), '&lt;', '<'), '&gt;', '>'), '&amp;', '&')"))
      .withColumn("clean", trim(regexp_replace(col("x"), " +", " ")))
      .select(col("doc_id"), lng(length(col("html"))).as("html_len"),
        lng(length(col("clean"))).as("clean_len"),
        round(dbl(length(col("clean"))) / length(col("html")), 6).as("text_ratio"),
        col("clean"))
      .orderBy("doc_id")
  )

  /** URL canonicalization dedup — in a web pipeline this runs BEFORE
    * content dedup (collapsing tracking-parameter and fragment
    * variants of one page is orders of magnitude cheaper than
    * re-crawling or content-hashing them). The corpus has no URL
    * column, so URLs are synthesized deterministically per document
    * (case-varied host, utm_* tracking params, fragments — the
    * planted-twin discipline) and the normalizer must collapse them:
    * lowercase, strip fragment, drop utm_* params, tidy separators.
    * Patterns are engine-shared (no backreferences — Spark's $1 vs
    * RE2's \\1 syntax diverges, so the chain is structured to never
    * need one). Per-row scan work + one aggregation.
    */
  /** Distinct-n generation-diversity readout (Li et al.'s distinct-1/
    * 2/3): per source and corpus-wide, the ratio of distinct n-grams
    * to total n-grams for n ∈ {1,2,3}. THE mode-collapse alarm for
    * synthetic/generated corpora — a generator that loops emits huge
    * token counts with a collapsing distinct ratio, which per-doc
    * repetition screens (q_repetition) miss because each document
    * looks locally fine.
    *
    * Scale: the corpus is touched exactly once — the lazily-built
    * n-gram stream rolls up to one row per distinct (source, n, hash)
    * with its occurrence count ([[distinctNGramRollup]], map-side
    * combined), and both scopes (per-source and '(all)') derive from
    * that gram-type-bounded persisted residue: per-source totals are
    * sums, per-source distincts are plain counts, and only the
    * corpus-wide distinct needs a (residue-sized, 8-byte-keyed)
    * countDistinct. Counts are exact BIGINTs; output is bounded by
    * sources × 3; the only float op is one int64→double division,
    * rounded 6.
    *
    * The distinct side counts 48-bit md5 GRAM HASHES, not raw gram
    * strings (r9, the r8 verdict's one `weak` grade): corpus-wide
    * distinct over raw strings is the classic scale-killer — the
    * expand shuffle carries the whole gram-type universe as wide
    * string keys. Hashing at the scan stage makes every shuffled key
    * 8 bytes; the hash is the engine-shared md5-48 idiom
    * (q_sketch_merge), so both engines count the identical set.
    * Collision undercount is ≈ G²/2⁴⁹ (G = gram types): ~2·10⁻⁶
    * relative at G = 10⁹ — noise for a diversity ratio, and
    * deterministic (both engines hash identically, so the compare is
    * still exact). [[distinctNSketch]] is the fully-sketched twin
    * whose state is bounded even below the hashed-distinct cost.
    */
  private val distinctN = QueryDef(
    "q_distinct_n",
    "Distinct-n diversity: per source and corpus-wide ('(all)'), " +
      "total and distinct n-gram counts (48-bit gram-hash distinct - " +
      "8-byte shuffle keys) and their ratio for n = 1, 2, 3 - the " +
      "mode-collapse alarm for generated corpora.",
    Some("""WITH t AS (SELECT source, regexp_extract_all(lower(text),'([a-z]+)',1) AS w FROM documents),
           |g AS (SELECT source, n, CAST(concat('0x', substr(md5(list_aggregate(w[i:i+n-1], 'string_agg', ' ')), 1, 12)) AS BIGINT) AS gh
           |      FROM t, unnest([1, 2, 3]) AS nn(n),
           |           unnest(generate_series(1, greatest(len(w) - n + 1, 0))) AS u(i)),
           |per AS (SELECT source, CAST(n AS BIGINT) AS n,
           |          CAST(count(*) AS BIGINT) AS total_ngrams,
           |          CAST(count(DISTINCT gh) AS BIGINT) AS distinct_ngrams
           |        FROM g GROUP BY 1, 2),
           |allr AS (SELECT '(all)' AS source, CAST(n AS BIGINT) AS n,
           |           CAST(count(*) AS BIGINT) AS total_ngrams,
           |           CAST(count(DISTINCT gh) AS BIGINT) AS distinct_ngrams
           |         FROM g GROUP BY 2),
           |u AS (SELECT * FROM per UNION ALL SELECT * FROM allr)
           |SELECT source, n, total_ngrams, distinct_ngrams,
           |       round(CAST(distinct_ngrams AS DOUBLE) / total_ngrams, 6) AS distinct_ratio
           |FROM u ORDER BY source, n""".stripMargin),
    (s, d) => {
      val dist = distinctNGramRollup(s, d)
      val per = dist.groupBy("source", "n")
        .agg(lng(sum(col("c"))).as("total_ngrams"),
          lng(count(lit(1))).as("distinct_ngrams"))
        .select(col("source"), lng(col("n")).as("n"),
          col("total_ngrams"), col("distinct_ngrams"))
      val allr = dist.groupBy("n")
        .agg(lng(sum(col("c"))).as("total_ngrams"),
          lng(countDistinct(col("gh"))).as("distinct_ngrams"))
        .select(lit("(all)").as("source"), lng(col("n")).as("n"),
          col("total_ngrams"), col("distinct_ngrams"))
      per.unionByName(allr)
        .withColumn("distinct_ratio",
          round(dbl(col("distinct_ngrams")) / col("total_ngrams"), 6))
        .orderBy("source", "n")
    }
  )

  /** Shared first stage for [[distinctN]] / [[distinctNSketch]]: the
    * (source, n, gram-hash) occurrence stream rolled up to one row per
    * DISTINCT (source, n, gh) with its occurrence count — the corpus
    * is touched exactly ONCE, and both the per-source and corpus-wide
    * scopes (and the KMV sketches) derive from this gram-type-bounded
    * persisted residue. Hash = engine-shared md5-48; grams never leave
    * the scan stage as strings, and the rollup shuffle carries 8-byte
    * keys with map-side combine.
    */
  private def distinctNGramRollup(s: SparkSession, d: String): DataFrame =
    distinctNGramHashes(s, d)
      // the rollup reduce combines the full occurrence stream into the
      // gram-type residue — byte-light (8-byte keys) but row-heavy, so
      // AQE's size-based coalescing folds it to ~1 task (SURVEY §4.2
      // r9 trap). An explicit fixed-count repartition on the grouping
      // keys pins the parallelism; the aggregate then runs complete
      // per-partition with no second exchange. Map-side combine is
      // forfeited, but 3-gram types are near-unique so it bought
      // little.
      .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
        col("source"), col("n"), col("gh"))
      .groupBy("source", "n", "gh").agg(lng(count(lit(1))).as("c"))
      .persist()

  /** The lazily-exploded (source, n, gram-hash) occurrence stream —
    * over [[graft.core.Tables.documentsSpread]]: 3 gram levels × md5
    * per gram is exactly the row-heavy map work the single-split scan
    * would serialize (profiled 1.9 s single-task at bench scale).
    */
  private def distinctNGramHashes(s: SparkSession, d: String): DataFrame =
    documentsSpread(s, d)
      .select(col("source"),
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)").as("w"))
      .select(col("source"), explode(expr(
        """flatten(transform(array(1, 2, 3), n ->
          |  transform(slice(sequence(1, greatest(size(w) - n + 1, 1)), 1, greatest(size(w) - n + 1, 0)),
          |    i -> named_struct('n', n,
          |      'gh', CAST(conv(substr(md5(array_join(slice(w, i, n), ' ')), 1, 12), 16, 10) AS BIGINT)))))""".stripMargin))
        .as("p"))
      .select(col("source"), col("p.n").as("n"), col("p.gh").as("gh"))

  /** The fully-sketched 100 TB path for [[distinctN]]: per-(source, n)
    * KMV sketches of the gram-hash stream via [[graft.functions
    * .KmvSketch]] — a partial-aggregating Aggregator whose map-side
    * state is ≤128 longs per group with duplicates dropped ON INSERT
    * (correct over any stream, so it needs no upstream distinct; here
    * it runs over the [[distinctNGramRollup]] residue shared with
    * q_distinct_n, and unlike q_sketch_merge's window form nothing is
    * ever globally sorted). The '(all)' scope is built by MERGING the
    * per-source sketches (explode + re-aggregate with the same
    * Aggregator — union, re-take the 128 smallest: the defining KMV
    * property), NOT by re-scanning the corpus. Exact hashed-distinct
    * counts ride along as the gate (the sketch-gate discipline,
    * §2.14); at 100 TB you ship only the sketch columns.
    *
    * Oracle: DuckDB replays the sketch as the window form (distinct →
    * row_number ≤ 128) — per-group result equality between the two
    * constructions is exactly the associativity property the
    * Aggregator claims.
    */
  private val distinctNSketch = QueryDef(
    "q_distinct_n_sketch",
    "KMV-sketched distinct-n: per-(source, n) 128-minimum gram-hash " +
      "sketches, '(all)' scope merged from the per-source sketches; " +
      "exact hashed distinct, sketch estimate and error per scope - " +
      "the bounded-state distinct-gram path at 100 TB.",
    Some("""WITH t AS (SELECT source, regexp_extract_all(lower(text),'([a-z]+)',1) AS w FROM documents),
           |g AS (SELECT source, n, CAST(concat('0x', substr(md5(list_aggregate(w[i:i+n-1], 'string_agg', ' ')), 1, 12)) AS BIGINT) AS gh
           |      FROM t, unnest([1, 2, 3]) AS nn(n),
           |           unnest(generate_series(1, greatest(len(w) - n + 1, 0))) AS u(i)),
           |d AS (SELECT DISTINCT source, n, gh FROM g),
           |rk AS (SELECT source, n, gh, row_number() OVER (PARTITION BY source, n ORDER BY gh) AS rk FROM d),
           |sk AS (SELECT source, n, gh FROM rk WHERE rk <= 128),
           |tot AS (SELECT source, n, CAST(count(*) AS BIGINT) AS total_ngrams,
           |          CAST(count(DISTINCT gh) AS BIGINT) AS n_exact FROM g GROUP BY 1, 2),
           |per AS (SELECT t.source, CAST(t.n AS BIGINT) AS n, t.total_ngrams, t.n_exact,
           |          p.kth, p.k_used
           |        FROM tot t JOIN (SELECT source, n, max(gh) AS kth,
           |                           CAST(count(*) AS BIGINT) AS k_used
           |                         FROM sk GROUP BY 1, 2) p USING (source, n)),
           |dall AS (SELECT DISTINCT n, gh FROM sk),
           |rka AS (SELECT n, gh, row_number() OVER (PARTITION BY n ORDER BY gh) AS rk FROM dall),
           |ska AS (SELECT n, gh FROM rka WHERE rk <= 128),
           |tota AS (SELECT n, CAST(count(*) AS BIGINT) AS total_ngrams,
           |           CAST(count(DISTINCT gh) AS BIGINT) AS n_exact FROM g GROUP BY 1),
           |alla AS (SELECT '(all)' AS source, CAST(t.n AS BIGINT) AS n, t.total_ngrams, t.n_exact,
           |           p.kth, p.k_used
           |         FROM tota t JOIN (SELECT n, max(gh) AS kth,
           |                             CAST(count(*) AS BIGINT) AS k_used
           |                           FROM ska GROUP BY 1) p USING (n)),
           |u AS (SELECT * FROM per UNION ALL SELECT * FROM alla)
           |SELECT source, n, total_ngrams, n_exact, k_used,
           |       CASE WHEN k_used < 128 THEN CAST(n_exact AS DOUBLE)
           |            ELSE round(127.0 * 281474976710656 / kth, 3) END AS n_est,
           |       round(abs(CASE WHEN k_used < 128 THEN CAST(n_exact AS DOUBLE)
           |                      ELSE round(127.0 * 281474976710656 / kth, 3) END - n_exact)
           |             * 100.0 / n_exact, 3) AS err_pct
           |FROM u ORDER BY source, n""".stripMargin),
    (s, d) => {
      val dist = distinctNGramRollup(s, d)
      val kmv = graft.functions.KmvSketch.kmv(128)
      val per = dist.groupBy("source", "n")
        .agg(lng(sum(col("c"))).as("total_ngrams"),
          lng(count(lit(1))).as("n_exact"),
          kmv(col("gh")).as("sk"))
        .select(col("source"), lng(col("n")).as("n"),
          col("total_ngrams"), col("n_exact"), col("sk"))
        .persist() // sketch residue: 60 rows × ≤128 longs, reused twice
      val merged = per.select(col("n"), explode(col("sk")).as("gh"))
        .groupBy("n").agg(kmv(col("gh")).as("sk"))
      val allRows = dist.groupBy("n")
        .agg(lng(sum(col("c"))).as("total_ngrams"),
          lng(countDistinct(col("gh"))).as("n_exact"))
        .join(merged, "n")
        .select(lit("(all)").as("source"), lng(col("n")).as("n"),
          col("total_ngrams"), col("n_exact"), col("sk"))
      val u = per.unionByName(allRows)
        .withColumn("k_used", lng(size(col("sk"))))
        .withColumn("kth", element_at(col("sk"), size(col("sk"))))
      val est = when(col("k_used") < 128, dbl(col("n_exact")))
        .otherwise(round(lit(127.0) * lit(281474976710656L) / col("kth"), 3))
      u.select(col("source"), col("n"), col("total_ngrams"), col("n_exact"),
          col("k_used"), est.as("n_est"),
          round(abs(est - col("n_exact")) * lit(100.0) / col("n_exact"), 3)
            .as("err_pct"))
        .orderBy("source", "n")
    }
  )

  private val urlNormalize = QueryDef(
    "q_url_normalize",
    "URL normalization dedup: lowercase, fragment strip, utm_* " +
      "tracking-param removal, separator tidy-up; variant counts per " +
      "canonical URL — the cheap pre-content web dedup step.",
    Some("""WITH u AS (SELECT doc_id,
           |  'https://' || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END) ||
           |  '.example.com/page/' || (doc_id % 50) ||
           |  (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&id=' || (doc_id % 10) || '&utm_campaign=x'
           |        ELSE '?id=' || (doc_id % 10) END) ||
           |  (CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END) AS url
           |  FROM documents),
           |n1 AS (SELECT doc_id, url, regexp_replace(lower(url), '#.*$', '') AS x FROM u),
           |n2 AS (SELECT doc_id, url, regexp_replace(x, 'utm_[a-z]+=[^&#]*&?', '', 'g') AS x FROM n1),
           |n3 AS (SELECT doc_id, url, regexp_replace(regexp_replace(x, '[?&]+$', ''), '\?&', '?') AS norm FROM n2)
           |SELECT norm AS norm_url, CAST(count(*) AS BIGINT) AS n_variants,
           |       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms,
           |       CAST(min(doc_id) AS BIGINT) AS canonical_doc
           |FROM n3 GROUP BY norm ORDER BY norm""".stripMargin),
    (s, d) => documents(s, d)
      .withColumn("url", expr(
        """concat('https://',
          |  CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END,
          |  '.example.com/page/', doc_id % 50,
          |  CASE WHEN doc_id % 2 = 0
          |       THEN concat('?utm_source=feed&id=', doc_id % 10, '&utm_campaign=x')
          |       ELSE concat('?id=', doc_id % 10) END,
          |  CASE WHEN doc_id % 5 = 0 THEN '#section-2' ELSE '' END)""".stripMargin))
      .withColumn("x", regexp_replace(lower(col("url")), "#.*$", ""))
      .withColumn("x", regexp_replace(col("x"), "utm_[a-z]+=[^&#]*&?", ""))
      .withColumn("norm",
        regexp_replace(regexp_replace(col("x"), "[?&]+$", ""), "\\?&", "?"))
      .groupBy(col("norm").as("norm_url"))
      .agg(lng(count(lit(1))).as("n_variants"),
        lng(countDistinct(col("url"))).as("n_raw_forms"),
        lng(min(col("doc_id"))).as("canonical_doc"))
      .orderBy("norm_url")
  )

  // ------------------------------------------------------------------- bleu

  private val bleu = QueryDef(
    "q_bleu",
    "Corpus-level BLEU components (Papineni et al. 2002) — the n-gram " +
      "overlap eval for generated text that the retrieval metrics " +
      "(q_ndcg, q_auc) cannot express: candidate docs are scored " +
      "against a deterministic reference pairing (each doc vs the " +
      "NEXT doc_id in its source — the pairing the eval harness would " +
      "supply in production). Per (source, n ∈ {1,2}): clipped " +
      "matched n-grams Σ min(cnt_cand, cnt_ref), total candidate " +
      "n-grams, the modified precision p_n, and the brevity " +
      "candidate/reference length ratio — all exact BIGINT counts " +
      "with single round-6 divisions; the exp(Σ ln p_n / N) " +
      "combination is left to the consumer (the ln ban — p_1, p_2 " +
      "and the length ratio ARE the metric's content). Shape: gram " +
      "counting explodes in the scan stage and reduces map-side " +
      "combined per (doc, n, gram); the clip join hash-partitions on " +
      "the (ref doc, gram) key — linear in corpus grams, the honest " +
      "BLEU cost; the pairing window sorts only the skinny (source, " +
      "doc_id) projection; the final table is sources × 2 rows.",
    Some("""WITH tok AS (SELECT doc_id, source, regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
           |            FROM documents),
           |pairs AS (SELECT source, doc_id AS cand,
           |            lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref
           |          FROM tok),
           |pr AS (SELECT source, cand, ref FROM pairs WHERE ref IS NOT NULL),
           |g1 AS (SELECT doc_id, 1 AS n, unnest(w) AS gram FROM tok),
           |g2 AS (SELECT doc_id, 2 AS n, w[i] || ' ' || w[i+1] AS gram
           |       FROM tok, unnest(generate_series(1, greatest(len(w)-1,0))) AS u(i)),
           |gc AS (SELECT doc_id, n, gram, count(*) AS cnt
           |       FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2) GROUP BY 1, 2, 3),
           |clip AS (SELECT pr.source, c.n,
           |           sum(least(c.cnt, coalesce(r.cnt, 0))) AS clip_cnt,
           |           sum(c.cnt) AS total_cnt
           |         FROM pr JOIN gc c ON c.doc_id = pr.cand
           |         LEFT JOIN gc r ON r.doc_id = pr.ref AND r.n = c.n AND r.gram = c.gram
           |         GROUP BY 1, 2),
           |lens AS (SELECT doc_id, len(w) AS l FROM tok),
           |sl AS (SELECT pr.source, sum(cl.l) AS cand_tokens, sum(rl.l) AS ref_tokens
           |       FROM pr JOIN lens cl ON cl.doc_id = pr.cand
           |       JOIN lens rl ON rl.doc_id = pr.ref
           |       GROUP BY 1)
           |SELECT clip.source, CAST(clip.n AS BIGINT) AS n,
           |       CAST(clip_cnt AS BIGINT) AS clip_cnt,
           |       CAST(total_cnt AS BIGINT) AS total_cnt,
           |       round(CAST(clip_cnt AS DOUBLE) / total_cnt, 6) AS p_n,
           |       CAST(sl.cand_tokens AS BIGINT) AS cand_tokens,
           |       CAST(sl.ref_tokens AS BIGINT) AS ref_tokens,
           |       round(CAST(sl.cand_tokens AS DOUBLE) / sl.ref_tokens, 6) AS len_ratio
           |FROM clip JOIN sl USING (source)
           |ORDER BY source, n""".stripMargin),
    (s, d) => {
      val tok = documents(s, d).select(col("doc_id"), col("source"),
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)").as("w"))
        // tokenization feeds the pairing, both gram passes and the
        // length table — one materialization, four consumers
        .persist()
      val pw = Window.partitionBy("source").orderBy("doc_id")
      val pr = tok.select(col("source"), col("doc_id").as("cand"),
          lead(col("doc_id"), 1).over(pw).as("ref"))
        .filter(col("ref").isNotNull)
      val g1 = tok.select(col("doc_id"), lit(1).as("n"),
        explode(col("w")).as("gram"))
      // guarded clamped-sequence idiom (PLANS.md r9a): sub-2-word docs
      // yield an empty bigram list, never a descending [1,0] sequence
      val g2 = tok.select(col("doc_id"), lit(2).as("n"), explode(expr(
        """transform(slice(sequence(1, greatest(size(w) - 1, 1)), 1, greatest(size(w) - 1, 0)),
          |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))""".stripMargin))
        .as("gram"))
      val gc = g1.unionByName(g2)
        .groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("cnt"))
        .persist()
      val cc = gc.select(col("doc_id").as("cand"), col("n"),
        col("gram"), col("cnt").as("ccnt"))
      val rc = gc.select(col("doc_id").as("ref"), col("n"),
        col("gram"), col("cnt").as("rcnt"))
      val clip = pr.join(cc, "cand")
        .join(rc, Seq("ref", "n", "gram"), "left")
        .groupBy("source", "n")
        .agg(sum(least(col("ccnt"), coalesce(col("rcnt"), lit(0L)))).as("clip_cnt"),
          sum(col("ccnt")).as("total_cnt"))
      val lens = tok.select(col("doc_id"), size(col("w")).as("l"))
      val sl = pr
        .join(lens.select(col("doc_id").as("cand"), col("l").as("cl")), "cand")
        .join(lens.select(col("doc_id").as("ref"), col("l").as("rl")), "ref")
        .groupBy("source")
        .agg(sum("cl").as("cand_tokens"), sum("rl").as("ref_tokens"))
      clip.join(sl, "source")
        .select(col("source"), lng(col("n")).as("n"),
          lng(col("clip_cnt")).as("clip_cnt"),
          lng(col("total_cnt")).as("total_cnt"),
          round(dbl(col("clip_cnt")) / col("total_cnt"), 6).as("p_n"),
          lng(col("cand_tokens")).as("cand_tokens"),
          lng(col("ref_tokens")).as("ref_tokens"),
          round(dbl(col("cand_tokens")) / col("ref_tokens"), 6).as("len_ratio"))
        .orderBy("source", "n")
    }
  )

  // ---------------------------------------------------------------- rouge

  private val rougeN = QueryDef(
    "q_rouge_n",
    "Corpus-level ROUGE-N components (Lin 2004) — q_bleu's recall " +
      "complement over the same deterministic next-doc-in-source " +
      "reference pairing: per (source, n ∈ {1,2}), clipped matched " +
      "n-grams Σ min(cnt_cand, cnt_ref) over the REFERENCE total " +
      "(recall — what BLEU's precision direction misses, and the " +
      "direction summarization evals actually report), plus precision " +
      "and the rational-identity F1 2·clip/(cand+ref) in single " +
      "round-6 divisions of exact BIGINT counts (the 2pr/(p+r) chain " +
      "is banned — its two intermediate roundings diverge across " +
      "engines). Shape: identical to q_bleu — gram counts reduce " +
      "map-side, the clip join hash-partitions on the (ref doc, gram) " +
      "key, output sources × 2 rows.",
    Some("""WITH tok AS (SELECT doc_id, source, regexp_extract_all(lower(text), '([a-z]+)', 1) AS w
           |            FROM documents),
           |pairs AS (SELECT source, doc_id AS cand,
           |            lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref
           |          FROM tok),
           |pr AS (SELECT source, cand, ref FROM pairs WHERE ref IS NOT NULL),
           |g1 AS (SELECT doc_id, 1 AS n, unnest(w) AS gram FROM tok),
           |g2 AS (SELECT doc_id, 2 AS n, w[i] || ' ' || w[i+1] AS gram
           |       FROM tok, unnest(generate_series(1, greatest(len(w)-1,0))) AS u(i)),
           |gc AS (SELECT doc_id, n, gram, count(*) AS cnt
           |       FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2) GROUP BY 1, 2, 3),
           |clip AS (SELECT pr.source, r.n,
           |           sum(least(coalesce(c.cnt, 0), r.cnt)) AS clip_cnt,
           |           sum(r.cnt) AS ref_cnt
           |         FROM pr JOIN gc r ON r.doc_id = pr.ref
           |         LEFT JOIN gc c ON c.doc_id = pr.cand AND c.n = r.n AND c.gram = r.gram
           |         GROUP BY 1, 2),
           |cand_tot AS (SELECT pr.source, c.n, sum(c.cnt) AS cand_cnt
           |             FROM pr JOIN gc c ON c.doc_id = pr.cand GROUP BY 1, 2)
           |SELECT clip.source, CAST(clip.n AS BIGINT) AS n,
           |       CAST(clip_cnt AS BIGINT) AS clip_cnt,
           |       CAST(ref_cnt AS BIGINT) AS ref_cnt,
           |       CAST(cand_cnt AS BIGINT) AS cand_cnt,
           |       round(CAST(clip_cnt AS DOUBLE) / ref_cnt, 6) AS recall,
           |       round(CAST(clip_cnt AS DOUBLE) / cand_cnt, 6) AS precision,
           |       round(CAST(2 * clip_cnt AS DOUBLE) / (cand_cnt + ref_cnt), 6) AS f1
           |FROM clip JOIN cand_tot ON clip.source = cand_tot.source AND clip.n = cand_tot.n
           |ORDER BY clip.source, clip.n""".stripMargin),
    (s, d) => {
      val tok = documents(s, d).select(col("doc_id"), col("source"),
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)").as("w"))
        .persist()
      val pw = Window.partitionBy("source").orderBy("doc_id")
      val pr = tok.select(col("source"), col("doc_id").as("cand"),
          lead(col("doc_id"), 1).over(pw).as("ref"))
        .filter(col("ref").isNotNull)
      val g1 = tok.select(col("doc_id"), lit(1).as("n"),
        explode(col("w")).as("gram"))
      // guarded clamped-sequence idiom (PLANS.md r9a): sub-2-word docs
      // yield an empty bigram list, never a descending [1,0] sequence
      val g2 = tok.select(col("doc_id"), lit(2).as("n"), explode(expr(
        """transform(slice(sequence(1, greatest(size(w) - 1, 1)), 1, greatest(size(w) - 1, 0)),
          |  i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))""".stripMargin))
        .as("gram"))
      val gc = g1.unionByName(g2)
        .groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("cnt"))
        .persist()
      val rc = gc.select(col("doc_id").as("ref"), col("n"),
        col("gram"), col("cnt").as("rcnt"))
      val cc = gc.select(col("doc_id").as("cand"), col("n"),
        col("gram"), col("cnt").as("ccnt"))
      // recall direction: stream the REFERENCE grams, left-join the
      // candidate side — the mirror image of q_bleu's clip join
      val clip = pr.join(rc, "ref")
        .join(cc, Seq("cand", "n", "gram"), "left")
        .groupBy("source", "n")
        .agg(sum(least(coalesce(col("ccnt"), lit(0L)), col("rcnt"))).as("clip_cnt"),
          sum(col("rcnt")).as("ref_cnt"))
      val candTot = pr.join(cc, "cand")
        .groupBy("source", "n").agg(sum(col("ccnt")).as("cand_cnt"))
      clip.join(candTot, Seq("source", "n"))
        .select(col("source"), lng(col("n")).as("n"),
          lng(col("clip_cnt")).as("clip_cnt"),
          lng(col("ref_cnt")).as("ref_cnt"),
          lng(col("cand_cnt")).as("cand_cnt"),
          round(dbl(col("clip_cnt")) / col("ref_cnt"), 6).as("recall"),
          round(dbl(col("clip_cnt")) / col("cand_cnt"), 6).as("precision"),
          round(dbl(lit(2) * col("clip_cnt")) / (col("cand_cnt") + col("ref_cnt")), 6).as("f1"))
        .orderBy("source", "n")
    }
  )

  // ----------------------------------------------------------------- chrf

  private val chrf = QueryDef(
    "q_chrf",
    "Corpus-level chrF components (Popović 2015) — the CHARACTER-level " +
      "eval completing the n-gram battery (q_bleu word precision, " +
      "q_rouge_n word recall): char-3-gram clipped overlap against the " +
      "same next-doc-in-source reference pairing, tolerant of " +
      "morphological variation word grams miss. Per source: clipped " +
      "matched 3-grams, candidate and reference totals, precision, " +
      "recall, and chrF2 via the rational identity 5·clip/(4·ref + " +
      "cand) — the (1+β²)PR/(β²P+R) chain algebraically reduced to ONE " +
      "division of exact BIGINTs (the multi-division form rounds " +
      "differently across engines). Grams are substrings of the raw " +
      "lowercased text, spaces included (the tokenization-free property " +
      "that makes chrF robust). Shape: the char-gram explode is the " +
      "only heavy stage — linear in corpus characters, reduced " +
      "map-side per (doc, gram) before the hash-partitioned clip join; " +
      "output is sources-sized.",
    Some("""WITH t AS (SELECT doc_id, source, lower(text) AS c FROM documents),
           |pairs AS (SELECT source, doc_id AS cand,
           |            lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref
           |          FROM t),
           |pr AS (SELECT source, cand, ref FROM pairs WHERE ref IS NOT NULL),
           |g AS (SELECT doc_id, substr(c, i, 3) AS gram, count(*) AS cnt
           |      FROM t, unnest(generate_series(1, greatest(length(c) - 2, 0))) AS u(i)
           |      GROUP BY 1, 2),
           |clip AS (SELECT pr.source,
           |           sum(least(c.cnt, coalesce(r.cnt, 0))) AS clip_cnt,
           |           sum(c.cnt) AS cand_cnt
           |         FROM pr JOIN g c ON c.doc_id = pr.cand
           |         LEFT JOIN g r ON r.doc_id = pr.ref AND r.gram = c.gram
           |         GROUP BY 1),
           |rtot AS (SELECT pr.source, sum(r.cnt) AS ref_cnt
           |         FROM pr JOIN g r ON r.doc_id = pr.ref GROUP BY 1)
           |SELECT clip.source, CAST(clip_cnt AS BIGINT) AS clip_cnt,
           |       CAST(cand_cnt AS BIGINT) AS cand_cnt,
           |       CAST(ref_cnt AS BIGINT) AS ref_cnt,
           |       round(CAST(clip_cnt AS DOUBLE) / cand_cnt, 6) AS chr_p,
           |       round(CAST(clip_cnt AS DOUBLE) / ref_cnt, 6) AS chr_r,
           |       round(CAST(5 * clip_cnt AS DOUBLE) / (4 * ref_cnt + cand_cnt), 6) AS chrf2
           |FROM clip JOIN rtot ON clip.source = rtot.source
           |ORDER BY clip.source""".stripMargin),
    (s, d) => {
      // documentsSpread: the char-gram explode (one row per CHARACTER)
      // is the heaviest map chain in the eval battery — the A/B-gated
      // spread case (SURVEY §4.2 r9 trap)
      val t = documentsSpread(s, d)
        .select(col("doc_id"), col("source"), lower(col("text")).as("c"))
        .persist()
      val pw = Window.partitionBy("source").orderBy("doc_id")
      val pr = t.select(col("source"), col("doc_id").as("cand"),
          lead(col("doc_id"), 1).over(pw).as("ref"))
        .filter(col("ref").isNotNull)
      // guarded clamped-sequence idiom: sub-3-char docs yield an empty
      // gram list, never a descending sequence
      val g = t.select(col("doc_id"), explode(expr(
        """transform(slice(sequence(1, greatest(length(c) - 2, 1)), 1, greatest(length(c) - 2, 0)),
          |  i -> substring(c, i, 3))""".stripMargin)).as("gram"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
        .persist()
      val cc = g.select(col("doc_id").as("cand"), col("gram"), col("cnt").as("ccnt"))
      val rc = g.select(col("doc_id").as("ref"), col("gram"), col("cnt").as("rcnt"))
      val clip = pr.join(cc, "cand")
        .join(rc, Seq("ref", "gram"), "left")
        .groupBy("source")
        .agg(sum(least(col("ccnt"), coalesce(col("rcnt"), lit(0L)))).as("clip_cnt"),
          sum(col("ccnt")).as("cand_cnt"))
      val rtot = pr.join(rc, "ref")
        .groupBy("source").agg(sum(col("rcnt")).as("ref_cnt"))
      clip.join(rtot, "source")
        .select(col("source"), lng(col("clip_cnt")).as("clip_cnt"),
          lng(col("cand_cnt")).as("cand_cnt"),
          lng(col("ref_cnt")).as("ref_cnt"),
          round(dbl(col("clip_cnt")) / col("cand_cnt"), 6).as("chr_p"),
          round(dbl(col("clip_cnt")) / col("ref_cnt"), 6).as("chr_r"),
          round(dbl(lit(5) * col("clip_cnt")) / (lit(4) * col("ref_cnt") + col("cand_cnt")), 6)
            .as("chrf2"))
        .orderBy("source")
    }
  )

  // ------------------------------------------------------------- c4/gopher

  /** Character error rate (CER) — the edit-distance eval completing
    * the n-gram battery's fourth corner: q_bleu measures word
    * precision, q_rouge_n word recall, q_chrf char-gram F; CER is the
    * ALIGNMENT-sensitive metric (ASR/OCR's standard readout) that
    * n-gram overlap cannot express — transposed spans cost edits even
    * when every gram matches. Uses the shared next-doc-in-source
    * pairing and a q_text_clean-SHAPED normalization that is
    * deliberately stricter: lowercase, [a-z ] ONLY (q_text_clean
    * keeps digits; here every non-letter drops so the alphabet is
    * exactly the [a-z]+ token alphabet the word evals use), collapsed
    * whitespace — micro-averaged per source.
    *
    * Determinism: the normalized strings are ASCII by construction,
    * where byte-Levenshtein (DuckDB) and char-Levenshtein (Spark) are
    * the SAME classic unit-cost DP — exact integer distances in both
    * engines (this is the load-bearing reason for the [a-z ] alphabet:
    * DuckDB's levenshtein is byte-based, so any multi-byte character
    * would desynchronize the engines). Micro CER = one round-6
    * division of exact BIGINT sums.
    *
    * Scale: the DP is O(len²) per pair but embarrassingly parallel
    * across pairs (one codegen'd levenshtein per joined row); the
    * pairing window sorts only the skinny (source, doc_id) projection;
    * output is sources-sized.
    */
  private val cer = QueryDef(
    "q_cer",
    "Character error rate over the next-doc-in-source pairing: " +
      "levenshtein distance between letters-and-spaces-normalized " +
      "texts (ASCII-only by construction, so both engines run the " +
      "identical unit-cost DP), micro-averaged per source as " +
      "Σedits / Σref-chars.",
    Some("""WITH cl AS (SELECT doc_id, source,
           |         trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +', ' ', 'g')) AS s
           |       FROM documents),
           |pairs AS (SELECT source, doc_id AS cand,
           |            lead(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS ref
           |          FROM cl),
           |pr AS (SELECT source, cand, ref FROM pairs WHERE ref IS NOT NULL),
           |pd AS (SELECT pr.source, levenshtein(c.s, r.s) AS dist, len(r.s) AS rl
           |       FROM pr JOIN cl c ON c.doc_id = pr.cand
           |               JOIN cl r ON r.doc_id = pr.ref)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
           |       CAST(sum(dist) AS BIGINT) AS edit_chars,
           |       CAST(sum(rl) AS BIGINT) AS ref_chars,
           |       round(CAST(sum(dist) AS DOUBLE) / nullif(sum(rl), 0), 6) AS cer
           |FROM pd GROUP BY source ORDER BY source""".stripMargin),
    (s, d) => {
      val cl = documents(s, d).select(col("doc_id"), col("source"),
          trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z ]", ""),
            " +", " ")).as("s"))
        .persist()
      val pw = Window.partitionBy("source").orderBy("doc_id")
      val pr = cl.select(col("source"), col("doc_id").as("cand"),
          lead(col("doc_id"), 1).over(pw).as("ref"))
        .filter(col("ref").isNotNull)
      // fixed-count repartition on the pair key BEFORE the DP runs:
      // the paired strings are byte-small but the levenshtein is
      // O(len²)-heavy, and AQE's byte-based coalescing folds the join
      // output to ONE task (profiled: two 3.2 s single-task stages at
      // sf0.1 — the SURVEY §4.2 trap, walk-sampling edition)
      val pd = pr
        .join(cl.select(col("doc_id").as("cand"), col("s").as("cs")), "cand")
        .join(cl.select(col("doc_id").as("ref"), col("s").as("rs")), "ref")
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("cand"))
        .select(col("source"), levenshtein(col("cs"), col("rs")).as("dist"),
          length(col("rs")).as("rl"))
      pd.groupBy("source")
        .agg(lng(count(lit(1))).as("n_pairs"),
          lng(sum("dist")).as("edit_chars"),
          lng(sum("rl")).as("ref_chars"),
          // nullif: all-empty reference texts give ref_chars = 0, where
          // Spark NULL-on-div-0 and DuckDB inf diverge (ADVICE r10)
          round(dbl(sum("dist")) / nullif(sum(col("rl")), lit(0)), 6).as("cer"))
        .orderBy("source")
    }
  )

  private val c4Gopher = QueryDef(
    "q_c4_gopher",
    "Composed quality-filter GATE in the C4/Gopher shape (Raffel et " +
      "al. 2020; Rae et al. 2021): five per-document rule flags — word " +
      "count in [30, 90], mean word length in [3, 10], ≥ 2 stopword " +
      "hits, top-word share ≤ 1/8, type-token ratio ≥ 2/5 — AND-ed " +
      "into the keep decision, reported as the per-source pass-count " +
      "matrix + keep rate (the dashboard row a curation run publishes " +
      "before committing a corpus drop). Thresholds are adapted to " +
      "this corpus' 10-99-word docs; the per-doc signal providers " +
      "(q_repetition, q_readability, q_quality_score) stay per-doc — " +
      "this op is the composed decision. EVERY rule is an exact " +
      "integer comparison (mean word length as 3·n ≤ chars−(n−1) ≤ " +
      "10·n — no division anywhere until the final keep-rate round-6), " +
      "so the flags are engine-identical by construction. Shape: one " +
      "explode reduced to per-(doc, word) counts with map-side " +
      "combine, one per-doc rollup (stopword/top/distinct counts fall " +
      "out of the word-keyed rows), one sources-sized aggregation — " +
      "linear in corpus tokens, output = one row per source.",
    Some("""WITH t AS (SELECT doc_id, source, length(text) AS chars,
           |             string_split(text, ' ') AS ws FROM documents),
           |m AS (SELECT doc_id, source, chars,
           |        CAST(len(ws) AS BIGINT) AS n_words,
           |        CAST(len(list_distinct(ws)) AS BIGINT) AS n_dist,
           |        CAST(len(list_filter(ws, w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop,
           |        (SELECT CAST(max(c) AS BIGINT) FROM
           |          (SELECT count(*) AS c FROM unnest(ws) AS u(w) GROUP BY w)) AS top_cnt
           |      FROM t),
           |f AS (SELECT source,
           |        n_words BETWEEN 30 AND 90 AS f_wc,
           |        chars - (n_words - 1) BETWEEN 3 * n_words AND 10 * n_words AS f_mwl,
           |        n_stop >= 2 AS f_stop,
           |        top_cnt * 8 <= n_words AS f_rep,
           |        n_dist * 5 >= n_words * 2 AS f_ttr
           |      FROM m)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(CASE WHEN f_wc THEN 1 ELSE 0 END) AS BIGINT) AS pass_wc,
           |       CAST(sum(CASE WHEN f_mwl THEN 1 ELSE 0 END) AS BIGINT) AS pass_mwl,
           |       CAST(sum(CASE WHEN f_stop THEN 1 ELSE 0 END) AS BIGINT) AS pass_stop,
           |       CAST(sum(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT) AS pass_rep,
           |       CAST(sum(CASE WHEN f_ttr THEN 1 ELSE 0 END) AS BIGINT) AS pass_ttr,
           |       CAST(sum(CASE WHEN f_wc AND f_mwl AND f_stop AND f_rep AND f_ttr
           |                 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           |       round(CAST(sum(CASE WHEN f_wc AND f_mwl AND f_stop AND f_rep AND f_ttr
           |                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS keep_rate
           |FROM f GROUP BY 1 ORDER BY source""".stripMargin),
    (s, d) => {
      val ex = documents(s, d).select(col("doc_id"), col("source"),
        length(col("text")).as("chars"),
        explode(split(col("text"), " ")).as("w"))
      // per-(doc, word) counts first: stopword hits, the top-word count
      // and the distinct-word count all fall out of this one word-keyed
      // rollup — no second explode, no per-doc sort
      val wc = ex.groupBy("doc_id", "w")
        .agg(min("source").as("source"), min("chars").as("chars"),
          count(lit(1)).as("cnt"))
      val per = wc.groupBy("doc_id")
        .agg(min("source").as("source"), lng(min("chars")).as("chars"),
          lng(sum("cnt")).as("n_words"),
          lng(count(lit(1))).as("n_dist"),
          lng(max("cnt")).as("top_cnt"),
          lng(sum(when(col("w").isin("the", "a"), col("cnt"))
            .otherwise(0L))).as("n_stop"))
      val mwlBody = col("chars") - (col("n_words") - 1)
      val flags = per.select(col("source"),
        col("n_words").between(30, 90).as("f_wc"),
        (mwlBody >= col("n_words") * 3 && mwlBody <= col("n_words") * 10).as("f_mwl"),
        (col("n_stop") >= 2).as("f_stop"),
        (col("top_cnt") * 8 <= col("n_words")).as("f_rep"),
        (col("n_dist") * 5 >= col("n_words") * 2).as("f_ttr"))
      val keep = col("f_wc") && col("f_mwl") && col("f_stop") &&
        col("f_rep") && col("f_ttr")
      def passes(c: Column): Column = lng(sum(when(c, 1L).otherwise(0L)))
      flags.groupBy("source").agg(
        lng(count(lit(1))).as("n_docs"),
        passes(col("f_wc")).as("pass_wc"),
        passes(col("f_mwl")).as("pass_mwl"),
        passes(col("f_stop")).as("pass_stop"),
        passes(col("f_rep")).as("pass_rep"),
        passes(col("f_ttr")).as("pass_ttr"),
        passes(keep).as("n_keep"),
        round(dbl(sum(when(keep, 1L).otherwise(0L))) / count(lit(1)), 6)
          .as("keep_rate"))
        .orderBy("source")
    }
  )

  val defs: Seq[QueryDef] = Seq(langId, qualityScore, tokenCount,
    multimodalMeta, mediaEnergy, frameHist, fertility, textClean,
    piiRedact, repetition, charDiversity, htmlStrip, urlNormalize,
    distinctN, distinctNSketch, mediaDecode, wavDecode, pngDecode,
    gifDecode, mediaInterlace, gifAnim, jpegDecode, jpegProgressive,
    mediaSniff, fixEncoding, bleu, rougeN, chrf, cer, c4Gopher)
}
