package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.ops.Annotate
import graft.util.Det._

/** The reference's full generation pipeline (SURVEY.md §3.1) as one
  * lazy Spark plan: page split → ±2-page odd-center sliding window →
  * character chunking → annotator (deterministic stub via
  * mapPartitions, the LLM seam) → 3-stage JSON salvage → lineage
  * enrichment. Stages 2–9 of app/main.py:65-117, minus the real LLM.
  *
  * Because the stub is a pure function of the chunk, the whole chain is
  * oracle-checkable end-to-end — the DuckDB twin recomputes the
  * expected question/answer directly.
  *
  * Scale: one shuffle (the page window by doc_id); chunking and
  * annotation are partition-local; salvage/enrichment are codegen'd
  * projections. 100 TB of PDFs = more doc_id partitions, same plan.
  */
object PipelineQueries {

  private val PageLen = 120
  private val ChunkSize = 100
  private val ChunkStride = 80

  private val pipelineQa = QueryDef(
    "q_pipeline_qa",
    "End-to-end PDF→Q&A pipeline with the deterministic stub annotator " +
      "(window → chunk → annotate → salvage → enrich).",
    Some(s"""WITH pages AS (
            |  SELECT doc_id,
            |         unnest(generate_series(1, CAST(ceil(length(text) / $PageLen.0) AS INT))) AS page_no,
            |         unnest(list_transform(generate_series(1, CAST(ceil(length(text) / $PageLen.0) AS INT)),
            |                i -> substr(text, (i - 1) * $PageLen + 1, $PageLen))) AS page_text
            |  FROM documents),
            |win AS (
            |  SELECT doc_id, (page_no + 1) // 2 AS window_index,
            |         string_agg(page_text, chr(10) || chr(10))
            |           OVER (PARTITION BY doc_id ORDER BY page_no
            |                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS wtext
            |  FROM pages QUALIFY page_no % 2 = 1),
            |chunks AS (
            |  SELECT doc_id, window_index,
            |         unnest(generate_series(1, CAST((length(wtext) + ${ChunkStride - (ChunkSize - ChunkStride) - 1}) // $ChunkStride AS INT))) AS subchunk_index,
            |         unnest(list_transform(generate_series(1, CAST((length(wtext) + ${ChunkStride - (ChunkSize - ChunkStride) - 1}) // $ChunkStride AS INT)),
            |                i -> substr(wtext, (i - 1) * $ChunkStride + 1, $ChunkSize))) AS chunk
            |  FROM win)
            |SELECT doc_id, CAST(window_index AS BIGINT) AS window_index,
            |       CAST(subchunk_index AS BIGINT) AS subchunk_index,
            |       'What does chunk ' || subchunk_index || ' of window ' || window_index ||
            |         ' in doc ' || doc_id || ' discuss?' AS question,
            |       substr(replace(chunk, chr(10), ' '), 1, 30) AS answer,
            |       'doc_' || doc_id || '.pdf' AS source_file
            |FROM chunks
            |ORDER BY doc_id, window_index, subchunk_index""".stripMargin),
    (s, d) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      import s.implicits._
      // 1. page split (reference: extract_pages_from_pdf, app/main.py:19-27)
      val pages = documents(s, d)
        .select(col("doc_id"),
          posexplode(expr(
            s"transform(sequence(1, CAST(ceil(length(text) / $PageLen.0) AS INT)), i -> substring(text, (i - 1) * $PageLen + 1, $PageLen))"))
            .as(Seq("p0", "page_text")))
        .select(col("doc_id"), (col("p0") + 1).as("page_no"), col("page_text"))
      // 2. ±2-page window, odd centers (app/main.py:76-82)
      val w = Window.partitionBy("doc_id").orderBy("page_no").rowsBetween(-2, 2)
      val windows = pages
        .withColumn("wtext", array_join(collect_list(col("page_text")).over(w), "\n\n"))
        .filter(col("page_no") % 2 === 1)
        .select(col("doc_id"), expr("(page_no + 1) DIV 2").as("window_index"), col("wtext"))
      // 3. sub-chunking (app/main.py:84-88,101)
      val chunks = windows
        .select(col("doc_id"), col("window_index"),
          posexplode(expr(
            s"transform(sequence(1, CAST(ceil((length(wtext) - ${ChunkSize - ChunkStride}) / $ChunkStride.0) AS INT)), i -> substring(wtext, (i - 1) * $ChunkStride + 1, $ChunkSize))"))
            .as(Seq("c0", "chunk")))
        .select(col("doc_id"), col("window_index"),
          (col("c0") + 1).cast("long").as("subchunk_index"), col("chunk"))
        .as[Annotate.Chunk]
      // 4. annotator seam (app/main.py:37-44,105) — mapPartitions, stub
      val raw = Annotate.annotate(chunks, Annotate.StubAnnotator)
      // 5. 3-stage salvage (app/main.py:46-58) + validity filter (:106)
      val fenced = "(?s)```json\\s*(\\{.*?\\})\\s*```"
      val salvaged = raw
        .withColumn("cand", coalesce(
          when(get_json_object(col("raw"), "$.question").isNotNull, col("raw")),
          nullif(regexp_extract(col("raw"), fenced, 1), lit("")),
          nullif(regexp_extract(col("raw"), "(?s)`(\\{.*?\\})`", 1), lit(""))))
        .withColumn("question", get_json_object(col("cand"), "$.question"))
        .withColumn("answer", get_json_object(col("cand"), "$.answer"))
        .filter(col("question").isNotNull && col("answer").isNotNull)
      // 6. lineage enrichment (app/main.py:107-109)
      val enriched = salvaged
        .select(col("doc_id"), col("window_index"), col("subchunk_index"),
          col("question"), col("answer"),
          concat(lit("doc_"), col("doc_id"), lit(".pdf")).as("source_file"))
        // persist: stages 3-6 after the window shuffle are all
        // partition-local (explode → mapPartitions annotate → regex
        // salvage) with no exchange before the oracle-determinism
        // orderBy, so the range sort's sampling pass would otherwise
        // re-run the whole chunk/annotate/salvage chain a second time
        .persist()
      enriched.orderBy("doc_id", "window_index", "subchunk_index")
    }
  )

  // ----------------------------------------------------------- seq packing

  /** Context-window token budget for q_pack_sequences. Small relative to
    * the synthetic docs (~40 tokens each) so packs hold ~10 docs and the
    * pack table is big enough to exercise the grouping.
    */
  private val PackBudget = 512L

  private val packSequences = QueryDef(
    "q_pack_sequences",
    "Sequence packing for LM pretraining (concat-and-chunk): documents " +
      "are concatenated in doc_id order and cut into fixed 512-token " +
      "context windows; each document belongs to the pack where its " +
      "first token lands (pack_id = tokens-before DIV 512), giving " +
      "per-pack document counts, token loads and id ranges — the " +
      "batch-shaping step between corpus curation and the trainer. " +
      "Integer-only arithmetic (token counts, cumulative offsets, " +
      "integer division) — nothing to drift between engines. Scale " +
      "shape: the global running token count NEVER uses an " +
      "unpartitioned window — docs are range-bucketed into 256 buckets " +
      "by a pure function of doc_id and the broadcast max id, the " +
      "within-bucket exclusive prefix sum runs on a PARTITIONED " +
      "window, and cross-bucket offsets come from a 256-row " +
      "aggregate self-joined and broadcast back (q_skyline/q_auc's " +
      "two-pass, with the bucket COUNT held constant as the corpus " +
      "grows — each bucket is N/256 docs, so the window partitions " +
      "scale with the data instead of the bucket table exploding).",
    Some(s"""WITH nt AS (SELECT doc_id,
            |              len(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS nt
            |            FROM documents),
            |c AS (SELECT doc_id, nt,
            |        coalesce(sum(nt) OVER (ORDER BY doc_id
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
            |      FROM nt)
            |SELECT CAST(cum_before // $PackBudget AS BIGINT) AS pack_id,
            |       CAST(count(*) AS BIGINT) AS n_docs,
            |       CAST(sum(nt) AS BIGINT) AS n_tokens,
            |       CAST(min(doc_id) AS BIGINT) AS first_doc,
            |       CAST(max(doc_id) AS BIGINT) AS last_doc
            |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val nt = documents(s, d).select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '([a-z]+)', 1)"))
          .cast("long").as("nt"))
      // range-bucket by doc_id against the broadcast max id: always 256
      // buckets of ~N/256 docs regardless of corpus size
      val mx = nt.agg(max("doc_id").as("mx"))
      val b = nt.crossJoin(broadcast(mx))
        .withColumn("bucket", expr("CAST(doc_id * 256 DIV (mx + 1) AS INT)"))
        .drop("mx")
      val wIn = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val inB = b.withColumn("inb", coalesce(sum("nt").over(wIn), lit(0L)))
      // bucket totals from the WINDOWED rows (exclusive prefix of the
      // last doc + its own count = the bucket sum) rather than from `b`:
      // both consumers then sit above the same bucket exchange, which
      // ReuseExchange dedups — the corpus is tokenized ONCE, not twice
      val bTot = inB.groupBy("bucket")
        .agg(max(col("inb") + col("nt")).as("bn"))
      val off = bTot.as("a")
        .join(bTot.as("b"), col("b.bucket") < col("a.bucket"), "left")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("b.bn")), lit(0L)).as("off"))
      inB.join(broadcast(off), "bucket")
        .withColumn("pack_id", expr(s"(off + inb) DIV $PackBudget"))
        .groupBy("pack_id")
        .agg(lng(count(lit(1))).as("n_docs"),
          lng(sum("nt")).as("n_tokens"),
          lng(min("doc_id")).as("first_doc"),
          lng(max("doc_id")).as("last_doc"))
        .orderBy("pack_id")
    }
  )

  /** Deterministic training-order shuffle + shard assignment — the
    * data-loader contract: every worker must derive the SAME global
    * order with no coordination, so both the shard and the within-
    * shard position are pure functions of doc_id (md5-keyed). The
    * within-shard window partitions by shard (16 ways here, hundreds
    * at scale) — there is never a global sort; a shard's rows sort
    * locally on their own executor.
    */
  private val shuffleShards = QueryDef(
    "q_shuffle_shards",
    "md5-keyed corpus shuffle into 16 loader shards with deterministic " +
      "within-shard positions — reproducible training order as a pure " +
      "function of doc_id.",
    Some("""WITH keyed AS (
           |  SELECT doc_id, n_chars,
           |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 12)) AS BIGINT) AS hk
           |  FROM documents)
           |SELECT doc_id, hk % 16 AS shard,
           |       CAST(row_number() OVER (PARTITION BY hk % 16 ORDER BY hk, doc_id) AS BIGINT) AS pos,
           |       CAST(n_chars AS BIGINT) AS n_chars
           |FROM keyed ORDER BY shard, pos""".stripMargin),
    (s, d) => {
      val w = Window.partitionBy("shard").orderBy("hk", "doc_id")
      documents(s, d)
        .select(col("doc_id"), lng(col("n_chars")).as("n_chars"),
          expr("CAST(conv(substr(md5(concat(cast(doc_id as string), ':shard')), 1, 12), 16, 10) AS BIGINT)").as("hk"))
        .withColumn("shard", col("hk") % 16)
        .select(col("doc_id"), col("shard"),
          lng(row_number().over(w)).as("pos"), col("n_chars"))
        .orderBy("shard", "pos")
    }
  )

  /** Rendezvous (highest-random-weight) hashing, Thaler & Ravishankar
    * 1996: shard(doc) = argmax over shards of hash(doc, shard). The
    * defining property — adding shard N+1 moves ONLY the docs whose new
    * hash wins, each moving TO the new shard and nowhere else (expected
    * 1/(N+1) of the corpus) — is what `hk % N` (q_shuffle_shards)
    * cannot give: a modulus change remaps ~everything. The whole
    * readout reduces through the ≤ 9·9-row (shard8, shard9) transition
    * matrix, so nothing doc-sized is ever shuffled: the 9 hashes and
    * both argmaxes are scan-stage projections (no explode — the
    * candidate-shard loop is an array expression) feeding one
    * map-side-combined count.
    */
  private val rendezvous = QueryDef(
    "q_rendezvous",
    "Rendezvous-hash shard assignment and the 8→9 elastic-reshard " +
      "audit: per-shard doc counts under 8 and 9 shards and the moved-" +
      "out count — rendezvous moves only argmax winners to the NEW " +
      "shard (~1/9 of docs), where a modulus remap moves ~8/9.",
    Some("""WITH h AS (
           |  SELECT doc_id, list_transform(generate_series(0, 8),
           |    s -> CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(s AS VARCHAR)), 1, 12)) AS BIGINT)) AS hs
           |  FROM documents),
           |a AS (SELECT doc_id,
           |        list_position(hs[1:8], list_max(hs[1:8])) - 1 AS shard8,
           |        list_position(hs, list_max(hs)) - 1 AS shard9
           |      FROM h),
           |m AS (SELECT shard8, shard9, count(*) AS n FROM a GROUP BY 1, 2),
           |a8 AS (SELECT shard8 AS shard, sum(n) AS n8,
           |         sum(CASE WHEN shard9 <> shard8 THEN n ELSE 0 END) AS moved
           |       FROM m GROUP BY 1),
           |a9 AS (SELECT shard9 AS shard, sum(n) AS n9 FROM m GROUP BY 1)
           |SELECT CAST(a9.shard AS BIGINT) AS shard,
           |       CAST(coalesce(a8.n8, 0) AS BIGINT) AS n_shard8,
           |       CAST(a9.n9 AS BIGINT) AS n_shard9,
           |       CAST(coalesce(a8.moved, 0) AS BIGINT) AS n_moved_out,
           |       round(CASE WHEN coalesce(a8.n8, 0) = 0 THEN 0.0
           |             ELSE CAST(a8.moved AS DOUBLE) / a8.n8 END, 6) AS moved_frac
           |FROM a9 LEFT JOIN a8 ON a9.shard = a8.shard
           |ORDER BY shard""".stripMargin),
    (s, d) => {
      val a = documents(s, d).select(col("doc_id"), expr(
        """transform(sequence(0, 8),
          |  s -> CAST(conv(substr(md5(concat(cast(doc_id as string), '#', cast(s as string))), 1, 12), 16, 10) AS BIGINT))""".stripMargin)
        .as("hs"))
        .select(col("doc_id"),
          (expr("array_position(slice(hs, 1, 8), array_max(slice(hs, 1, 8)))") - 1).as("shard8"),
          (expr("array_position(hs, array_max(hs))") - 1).as("shard9"))
      val m = a.groupBy("shard8", "shard9").agg(count(lit(1)).as("n"))
        .persist()
      val a8 = m.groupBy(col("shard8").as("shard"))
        .agg(sum("n").as("n8"),
          sum(when(col("shard9") =!= col("shard8"), col("n")).otherwise(0L))
            .as("moved"))
      val a9 = m.groupBy(col("shard9").as("shard")).agg(sum("n").as("n9"))
      a9.join(a8, Seq("shard"), "left")
        .select(lng(col("shard")).as("shard"),
          lng(coalesce(col("n8"), lit(0L))).as("n_shard8"),
          lng(col("n9")).as("n_shard9"),
          lng(coalesce(col("moved"), lit(0L))).as("n_moved_out"),
          round(when(coalesce(col("n8"), lit(0L)) === 0, lit(0.0))
            .otherwise(dbl(col("moved")) / col("n8")), 6).as("moved_frac"))
        .orderBy("shard")
    }
  )

  /** Auto-generated dataset card — the one-row summary a curation run
    * publishes with a released corpus (docs, tokens, type/lang
    * cardinalities, length extremes, exact-dup groups, mean length).
    * Each statistic is its own map-side-combined aggregation over the
    * scan; the three single-row legs then cross-join broadcast-style.
    * Distinct-type/lang counts are exact here; at 100 TB the same
    * card swaps in the mergeable sketches (q_approx_distinct /
    * q_sketch_merge) with no shape change.
    */
  private val datasetCard = QueryDef(
    "q_dataset_card",
    "Dataset card: corpus-level doc/token/type/language counts, " +
      "token-length extremes, exact-duplicate group count and mean " +
      "tokens per document, as one released summary row.",
    Some("""WITH toks AS (SELECT doc_id, lang, regexp_extract_all(lower(text),'([a-z]+)',1) AS w FROM documents),
           |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |                CAST(sum(len(w)) AS BIGINT) AS n_tokens,
           |                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           |                CAST(min(len(w)) AS BIGINT) AS min_tokens,
           |                CAST(max(len(w)) AS BIGINT) AS max_tokens FROM toks),
           |types AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS n_types FROM (
           |  SELECT unnest(w) AS term FROM toks) x),
           |dup AS (SELECT CAST(count(*) AS BIGINT) AS n_exact_dup_groups FROM (
           |  SELECT md5(lower(text)) AS h FROM documents GROUP BY 1 HAVING count(*) > 1) x)
           |SELECT base.n_docs, base.n_tokens, base.n_langs, base.min_tokens,
           |       base.max_tokens, types.n_types, dup.n_exact_dup_groups,
           |       round(CAST(base.n_tokens AS DOUBLE) / base.n_docs, 6) AS mean_tokens
           |FROM base CROSS JOIN types CROSS JOIN dup""".stripMargin),
    (s, d) => {
      val toksDf = documents(s, d).select(col("doc_id"), col("lang"),
        expr("regexp_extract_all(lower(text), '([a-z]+)', 1)").as("w"))
      val base = toksDf.agg(
        lng(count(lit(1))).as("n_docs"),
        lng(sum(size(col("w")))).as("n_tokens"),
        lng(countDistinct(col("lang"))).as("n_langs"),
        lng(min(size(col("w")))).as("min_tokens"),
        lng(max(size(col("w")))).as("max_tokens"))
      val types = toksDf.select(explode(col("w")).as("term"))
        .agg(lng(countDistinct(col("term"))).as("n_types"))
      val dup = documents(s, d)
        .groupBy(md5(lower(col("text"))).as("h"))
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(lng(count(lit(1))).as("n_exact_dup_groups"))
      base.crossJoin(broadcast(types)).crossJoin(broadcast(dup))
        .select(col("n_docs"), col("n_tokens"), col("n_langs"),
          col("min_tokens"), col("max_tokens"), col("n_types"),
          col("n_exact_dup_groups"),
          round(dbl(col("n_tokens")) / col("n_docs"), 6).as("mean_tokens"))
    }
  )

  // ------------------------------------------------------- importance resample

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every pool
    * document by how much more likely it is under a TARGET-domain
    * hashed-unigram model than under the raw-pool model, then keep the
    * top-weighted slice — the cheap, scalable stand-in for "train a
    * quality classifier" that production pretraining mixes actually
    * use to up-sample domain-relevant text.
    *
    * Model: tokens hash into 256 buckets (the shared md5-48 idiom —
    * cross-engine, no vocabulary broadcast); target = the src1 slice;
    * add-one smoothing on both distributions; per-doc log importance
    * weight = Σ_tokens ln(p_target(b)/p_raw(b)).
    *
    * Determinism: each bucket's log-ratio is computed ONCE (256 rows),
    * written in identical IEEE op order in both engines, rounded on
    * the 9-grid into DECIMAL(18,9); per-doc accumulation is exact
    * decimal; ordering for the top-100 cut compares the SCALED BIGINT
    * (not the double) and tie-breaks on doc_id.
    *
    * Scale: one token-explode pass builds the 256-row bucket table
    * (map-side combined); the 256-row weight table broadcasts back
    * onto a second scan; the top-100 cut is orderBy+limit =
    * TakeOrderedAndProject (per-partition top-k, k rows per task — no
    * global sort, no unpartitioned window). 100 TB pool: two linear
    * scans + a constant-size broadcast.
    */
  private val dsir = QueryDef(
    "q_dsir",
    "DSIR importance resampling: hashed-unigram (256-bucket) target-" +
      "vs-pool log-likelihood ratio per doc, top-100 resampled docs " +
      "by exact-decimal weight - the scalable domain-upsampling pass " +
      "of a pretraining data mix.",
    Some("""WITH tok AS (
           |  SELECT doc_id, source,
           |         CAST(concat('0x', substr(md5(u.w), 1, 12)) AS BIGINT) % 256 AS b
           |  FROM documents, unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS u(w)),
           |bkt AS (
           |  SELECT b, CAST(count(*) AS BIGINT) AS raw,
           |         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS tgt
           |  FROM tok GROUP BY b),
           |tot AS (SELECT sum(raw) AS rtot, sum(tgt) AS ttot FROM bkt),
           |lw AS (
           |  SELECT b, CAST(round(ln((CAST(tgt + 1 AS DOUBLE) / CAST(ttot + 256 AS DOUBLE)) /
           |                           (CAST(raw + 1 AS DOUBLE) / CAST(rtot + 256 AS DOUBLE))), 9) AS DECIMAL(18,9)) AS lw
           |  FROM bkt CROSS JOIN tot),
           |doc AS (
           |  SELECT tok.doc_id, min(tok.source) AS source,
           |         CAST(count(*) AS BIGINT) AS n_toks, sum(lw.lw) AS s
           |  FROM tok JOIN lw ON tok.b = lw.b GROUP BY tok.doc_id)
           |SELECT doc_id, source, n_toks,
           |       round(CAST(CAST(s * 1000000000 AS BIGINT) AS DOUBLE) / 1000000000, 9) AS log_iw
           |FROM doc
           |ORDER BY CAST(s * 1000000000 AS BIGINT) DESC, doc_id LIMIT 100""".stripMargin),
    (s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")).as("w"))
        .select(col("doc_id"), col("source"),
          expr("CAST(conv(substr(md5(w), 1, 12), 16, 10) AS BIGINT) % 256").as("b"))
      val bkt = tok.groupBy("b").agg(
        lng(count(lit(1))).as("raw"),
        lng(sum(when(col("source") === "src1", 1).otherwise(0))).as("tgt"))
      val tot = bkt.agg(sum("raw").as("rtot"), sum("tgt").as("ttot"))
      val lw = bkt.crossJoin(broadcast(tot))
        .select(col("b"),
          round(log((dbl(col("tgt") + 1) / dbl(col("ttot") + 256)) /
            (dbl(col("raw") + 1) / dbl(col("rtot") + 256))), 9)
            .cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("lw"))
      tok.join(broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(min(col("source")).as("source"), lng(count(lit(1))).as("n_toks"),
          sum(col("lw")).as("s"))
        .withColumn("siw", expr("CAST(s * 1000000000 AS BIGINT)"))
        .orderBy(col("siw").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("source"), col("n_toks"),
          round(dbl(col("siw")) / lit(1000000000), 9).as("log_iw"))
    }
  )

  // ---------------------------------------------------------- quantile_norm

  private val quantileNorm = QueryDef(
    "q_quantile_norm",
    "Quantile normalization of per-source document-length " +
      "distributions onto the pooled corpus distribution — the " +
      "source-balancing transform next to q_mix_temperature (count " +
      "rebalance) and q_dsir (importance weights): after mapping, " +
      "every source's length distribution is the SAME distribution " +
      "(the per-source sums in the output are identical — the " +
      "normalizer's defining invariant, asserted by the oracle " +
      "match). Each doc maps to the pooled order statistic at its " +
      "within-source relative rank: rank rk of ns (window PARTITIONED " +
      "by source — never global), pooled index (2rk−1)·N ÷ 2ns + 1 " +
      "(exact BIGINT midpoint rank), resolved against the pooled " +
      "VALUE-LEVEL CDF (lo, hi] by a range join. SCALE SHAPE: the " +
      "CDF table is distinct-value-sized (zipfian-small at any " +
      "corpus size) and broadcasts; the global N is one scalar; no " +
      "global sort or global rank anywhere — at 100 TB the same plan " +
      "runs with a KLL-sketch CDF at bounded error. Everything " +
      "integer; no doubles at all.",
    Some("""WITH pool AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY 1),
           |cdf AS (SELECT n_chars,
           |          sum(c) OVER (ORDER BY n_chars
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
           |          coalesce(sum(c) OVER (ORDER BY n_chars
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
           |        FROM pool),
           |nn AS (SELECT count(*) AS n FROM documents),
           |r AS (SELECT source, n_chars,
           |        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
           |        count(*) OVER (PARTITION BY source) AS ns
           |      FROM documents),
           |idx AS (SELECT source, n_chars, ((2*rk - 1) * nn.n) // (2 * ns) + 1 AS ix
           |        FROM r CROSS JOIN nn),
           |m AS (SELECT i.source, i.n_chars, c.n_chars AS mapped
           |      FROM idx i JOIN cdf c ON i.ix > c.lo AND i.ix <= c.hi)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_before,
           |       CAST(sum(mapped) AS BIGINT) AS sum_after,
           |       CAST(min(mapped) AS BIGINT) AS min_mapped,
           |       CAST(max(mapped) AS BIGINT) AS max_mapped
           |FROM m GROUP BY source ORDER BY source""".stripMargin),
    (s, d) => {
      val docs = documents(s, d).select("source", "doc_id", "n_chars")
      val pool = docs.groupBy("n_chars").agg(count(lit(1)).as("c")).persist()
      // CDF prefix sums WITHOUT a global window (the PlanSpec gate /
      // ops/Sequence discipline): range-bucket the value domain by a
      // pure function of the key, collect the ≤(domain/64)-row bucket
      // totals (bounded by the VALUE RANGE of n_chars, not the corpus),
      // broadcast cumulative offsets back as a literal map, and run the
      // running sum per bucket — every window partition is one bucket
      val bucket = expr("CAST(n_chars DIV 64 AS INT)")
      val bTotals = pool.groupBy(bucket.as("b")).agg(sum(col("c")).as("bc"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val offsets: Map[Int, Long] = bTotals.map { case (b, n) =>
        val o = b -> acc; acc += n; o
      }.toMap
      val wb = Window.partitionBy("b").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cdf = pool.withColumn("b", bucket)
        .withColumn("hi",
          element_at(typedLit(offsets), col("b")) + sum(col("c")).over(wb))
        .withColumn("lo", col("hi") - col("c"))
        .select(col("n_chars").as("pv"), col("lo"), col("hi"))
      val nn = docs.agg(count(lit(1)).as("ntot"))
      val ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      val r = docs
        .withColumn("rk", row_number().over(ws))
        .withColumn("ns", count(lit(1)).over(Window.partitionBy("source")))
      val idx = r.crossJoin(broadcast(nn))
        .select(col("source"), col("n_chars"),
          (expr("((2*rk - 1) * ntot) DIV (2 * ns)") + 1).as("ix"))
      val m = idx.join(broadcast(cdf),
        col("ix") > col("lo") && col("ix") <= col("hi"))
      val out = m.groupBy("source").agg(
          lng(count(lit(1))).as("n_docs"),
          lng(sum(col("n_chars"))).as("sum_before"),
          lng(sum(col("pv"))).as("sum_after"),
          lng(min(col("pv"))).as("min_mapped"),
          lng(max(col("pv"))).as("max_mapped"))
        .orderBy("source")
      materializeThenRelease(out, pool)
    }
  )

  // ------------------------------------------------------------- slice_audit

  private val sliceAudit = QueryDef(
    "q_slice_audit",
    "Data-slice audit: rank (lang), (source) and (lang × source) " +
      "slices of the corpus by how far their mean document length " +
      "sits from the corpus mean, in standard-error units — the " +
      "slice-finder pass every training-data pipeline runs to catch " +
      "the one language × crawl-source cell whose documents are " +
      "systematically truncated (or bloated) before the model " +
      "memorizes the artifact. One GROUPING SETS aggregation " +
      "(Catalyst expands to a single Expand + hash aggregate — one " +
      "corpus pass for all three slice granularities, never three " +
      "scans); the global moment row is a single-row broadcast. The " +
      "z statistic is one shared double chain over exact BIGINT sums " +
      "— (sum_s·N − S·n_s)·√n_s / (n_s·√(N·ss − S²)) — so both " +
      "engines rank identically; top-10 by |z| under a total " +
      "tiebreak. At 100 TB the same plan holds: slices are " +
      "vocabulary-small, the Expand multiplies the scan ×3 and " +
      "map-side combine collapses it.",
    Some("""WITH g AS (SELECT count(*) AS nn, sum(n_chars) AS s,
           |                  sum(n_chars*n_chars) AS ss FROM documents),
           |sl AS (SELECT coalesce(lang, '*') AS lang_dim,
           |         coalesce(source, '*') AS source_dim,
           |         count(*) AS n_docs, sum(n_chars) AS sum_chars
           |       FROM documents
           |       GROUP BY GROUPING SETS ((lang), (source), (lang, source))),
           |z AS (SELECT lang_dim, source_dim, n_docs, sum_chars,
           |        round((CAST(sum_chars AS DOUBLE) * g.nn - CAST(g.s AS DOUBLE) * n_docs)
           |              * sqrt(CAST(n_docs AS DOUBLE))
           |              / (CAST(n_docs AS DOUBLE) * sqrt(CAST(g.nn AS DOUBLE) * g.ss
           |                 - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE))), 6) AS z
           |      FROM sl CROSS JOIN g)
           |SELECT lang_dim, source_dim, CAST(n_docs AS BIGINT) AS n_docs,
           |       CAST(sum_chars AS BIGINT) AS sum_chars, z
           |FROM z ORDER BY abs(z) DESC, lang_dim, source_dim LIMIT 10""".stripMargin),
    (s, d) => {
      documents(s, d).createOrReplaceTempView("documents")
      s.sql(
        """WITH g AS (SELECT count(*) AS nn, sum(n_chars) AS s,
          |                  sum(n_chars*n_chars) AS ss FROM documents),
          |sl AS (SELECT coalesce(lang, '*') AS lang_dim,
          |         coalesce(source, '*') AS source_dim,
          |         count(*) AS n_docs, sum(n_chars) AS sum_chars
          |       FROM documents
          |       GROUP BY GROUPING SETS ((lang), (source), (lang, source))),
          |z AS (SELECT lang_dim, source_dim, n_docs, sum_chars,
          |        round((CAST(sum_chars AS DOUBLE) * nn - CAST(s AS DOUBLE) * n_docs)
          |              * sqrt(CAST(n_docs AS DOUBLE))
          |              / (CAST(n_docs AS DOUBLE) * sqrt(CAST(nn AS DOUBLE) * ss
          |                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))), 6) AS z
          |      FROM sl CROSS JOIN g)
          |SELECT lang_dim, source_dim, CAST(n_docs AS BIGINT) AS n_docs,
          |       CAST(sum_chars AS BIGINT) AS sum_chars, z
          |FROM z ORDER BY abs(z) DESC, lang_dim, source_dim LIMIT 10""".stripMargin)
    }
  )

  val defs: Seq[QueryDef] = Seq(pipelineQa, packSequences, shuffleShards, rendezvous,
    datasetCard, dsir, quantileNorm, sliceAudit)
}
