package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Corpus-mining operators over `documents`: per-document keyword
  * extraction, sentence segmentation statistics, and hashing-trick
  * feature vectors — the text-side feature-engineering passes a
  * training-data pipeline runs after cleaning and before tokenizer /
  * model work.
  *
  * Tokenization is the shared inventory convention
  * (`regexp_extract_all(lower(text), '([a-z]+)', 1)` — identical
  * extraction in Spark and DuckDB, see RankingQueries).
  *
  * Scale shapes (PLANS.md): token/sentence explodes run inside the
  * scan stage; per-(doc, term) counts reduce with map-side combine;
  * document-frequency joins are vocabulary-sized; the keyword window
  * partitions by doc_id (high cardinality). Nothing materializes an
  * unaggregated cross of documents × vocabulary.
  */
object CorpusQueries {

  private val toks = "regexp_extract_all(lower(text), '([a-z]+)', 1)"

  // ----------------------------------------------------------------- keywords

  private val keywords = QueryDef(
    "q_keywords",
    "Top-3 keywords per document, scored tf·N/df — the rational form " +
      "of tf-idf (ln is banned by the float-parity rules; for a fixed " +
      "document, tf·N/df ranks terms identically to any monotone idf " +
      "because N is constant and the score is monotone in tf and 1/df)." +
      " Terms shorter than 3 letters are dropped. Score is one IEEE " +
      "division of exact BIGINTs; ranking tie-breaks on the term so " +
      "equal scores order identically in both engines. Shape: scan-" +
      "stage token explode, map-side-combined (doc,term) counts, a " +
      "vocabulary-sized df join, and a top-3-per-doc window by doc_id " +
      "that compiles to a per-key group limit, not a global sort.",
    Some("""WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS term
           |           FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
           |       WHERE len(term) >= 3 GROUP BY 1, 2),
           |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t
           |       WHERE len(term) >= 3 GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM documents),
           |r AS (SELECT tf.doc_id, tf.term,
           |        round(CAST(tf.tf * n.n AS DOUBLE) / df.df, 6) AS score,
           |        row_number() OVER (PARTITION BY tf.doc_id
           |          ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.term) AS rnk
           |      FROM tf JOIN df USING (term) CROSS JOIN n)
           |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, score
           |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin),
    (s, d) => {
      val t = documents(s, d)
        .select(col("doc_id"), explode(expr(toks)).as("term"))
        .filter(length(col("term")) >= 3)
      val tf = t.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = t.groupBy("term").agg(countDistinct(col("doc_id")).as("df"))
      val n = documents(s, d).agg(count(lit(1)).as("n"))
      val score = dbl(col("tf") * col("n")) / col("df")
      val w = Window.partitionBy("doc_id").orderBy(score.desc, col("term"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), lng(col("rnk")).as("rnk"), col("term"),
          round(score, 6).as("score"))
        .orderBy("doc_id", "rnk")
    }
  )

  // ---------------------------------------------------------------- sentences

  private val sentences = QueryDef(
    "q_sentences",
    "Sentence segmentation statistics: documents split on [.!?]+ runs, " +
      "whitespace-trimmed, empties dropped; per document the sentence " +
      "count, mean sentence length in exact integer ppm-of-a-char " +
      "(1e6·total_chars floor-div n — no float mean, no rounding " +
      "ties), and the longest sentence's length. The whole computation " +
      "is per-row higher-order array functions inside the scan stage — " +
      "zero shuffles, zero explodes — exactly how a 100 TB corpus " +
      "wants its per-document statistics computed. Sentence-length " +
      "screens feed chunking policy and quality filters.",
    Some("""WITH l AS (SELECT doc_id,
           |             list_filter(list_transform(
           |               regexp_split_to_array(text, '[.!?]+'),
           |               x -> len(trim(x))), v -> v > 0) AS lens
           |           FROM documents)
           |SELECT doc_id, CAST(len(lens) AS BIGINT) AS n_sentences,
           |       CAST(CASE WHEN len(lens) = 0 THEN NULL
           |            ELSE 1000000 * list_sum(lens) // len(lens) END AS BIGINT) AS mean_len_ppm,
           |       CAST(list_max(lens) AS BIGINT) AS max_len
           |FROM l ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d)
      .select(col("doc_id"), expr(
        "filter(transform(split(text, '[.!?]+'), x -> length(trim(x))), v -> v > 0)")
        .as("lens"))
      .select(col("doc_id"),
        lng(size(col("lens"))).as("n_sentences"),
        lng(when(size(col("lens")) === 0, lit(null)).otherwise(
          expr("1000000 * aggregate(lens, 0L, (a, v) -> a + v) DIV size(lens)")))
          .as("mean_len_ppm"),
        lng(array_max(col("lens"))).as("max_len"))
      .orderBy("doc_id")
  )

  // ------------------------------------------------------------- feature hash

  private val featureHash = QueryDef(
    "q_feature_hash",
    "Hashing-trick feature vectors: each token maps to one of 64 " +
      "buckets via the first 8 hex digits of md5 (a hash both engines " +
      "share bit-for-bit — Spark conv(hex,16,10) ≡ DuckDB '0x'-cast), " +
      "emitting the sparse (doc_id, bucket, count) matrix that a " +
      "fixed-width model input needs with NO vocabulary pass and NO " +
      "vocabulary broadcast — the property that makes feature hashing " +
      "the 100 TB choice over dictionary encodings. Shape: scan-stage " +
      "explode, single map-side-combined aggregation; output is " +
      "bounded by docs × 64.",
    Some("""WITH t AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS term
           |           FROM documents)
           |SELECT doc_id,
           |       ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS bucket,
           |       CAST(count(*) AS BIGINT) AS n
           |FROM t GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin),
    (s, d) => documents(s, d)
      .select(col("doc_id"), explode(expr(toks)).as("term"))
      .select(col("doc_id"),
        (expr("CAST(conv(substring(md5(term), 1, 8), 16, 10) AS BIGINT)") % 64)
          .as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(lng(count(lit(1))).as("n"))
      .orderBy("doc_id", "bucket")
  )

  // ------------------------------------------------------------- BPE pairs

  /** Tokenizer-training primitive: the first step of byte-pair-encoding
    * is "count adjacent symbol pairs weighted by word frequency, merge
    * the top pair" — this computes the top-20 merge candidates over the
    * corpus. Scale shape: pair counting runs on the DISTINCT word
    * vocabulary (corpus-size-independent once frequencies are
    * aggregated), not on the raw token stream — the aggregation that
    * makes BPE training feasible on 100 TB is exactly this
    * word-frequency rollup.
    */
  private val bpePairs = QueryDef(
    "q_bpe_pairs",
    "Top-20 BPE merge candidates: adjacent character-pair frequencies " +
      "weighted by word frequency, counted over the distinct-word " +
      "vocabulary rather than the raw stream.",
    Some("""WITH words AS (
           |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
           |    SELECT unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS w FROM documents) t
           |  WHERE len(w) >= 2 GROUP BY w),
           |pairs AS (
           |  SELECT substr(w, unnest(generate_series(1, len(w) - 1)), 2) AS pair, freq
           |  FROM words),
           |agg AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS n FROM pairs GROUP BY pair)
           |SELECT pair, n FROM agg ORDER BY n DESC, pair LIMIT 20""".stripMargin),
    (s, d) => documents(s, d)
      .select(explode(expr(toks)).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
        col("freq"))
      .groupBy("pair")
      .agg(lng(sum(col("freq"))).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  )

  // ------------------------------------------------------------- BPE train

  /** Number of sequential BPE merges trained by q_bpe_train. */
  private val BpeSteps = 10

  /** DuckDB replay of the same [[BpeSteps]] merges as chained CTEs
    * (the q_pagerank unrolling discipline): v0 = char-split vocab,
    * then per step i: pair counts p_i over v_{i-1}, top-1 t_i
    * (ORDER BY n DESC, a, b), rewrite v_i applying t_i's merge with
    * the identical greedy left-to-right string fold the Spark side
    * runs (list_reduce with the last-symbol check `acc = a OR
    * ends_with(acc, '|' || a)` — symbols never contain '|').
    */
  /** The shared CTE chain v0..t[[BpeSteps]]: char-split vocab, then per
    * step the pair count, top-1 merge, and rewritten vocab. Both
    * q_bpe_train (reads t_i) and q_bpe_apply (reuses t_i to encode the
    * corpus) are built on this one string so the trained merges and the
    * applied merges cannot desynchronize.
    */
  private val bpeChainDuck: String = {
    val v0 = """v0 AS (
      |  SELECT list_reduce(list_transform(generate_series(1, len(w)), i -> w[i]),
      |           (acc, x) -> acc || '|' || x) AS sym, freq
      |  FROM (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
      |          SELECT unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS w FROM documents) t
      |        WHERE len(w) >= 2 GROUP BY w))""".stripMargin
    val steps = (1 to BpeSteps).map { i =>
      val p = i - 1
      s"""p$i AS (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT unnest(list_transform(generate_series(1, len(string_split(sym,'|')) - 1),
         |                 j -> struct_pack(a := string_split(sym,'|')[j], b := string_split(sym,'|')[j+1]))) AS pr,
         |               freq
         |        FROM v$p) t
         |  GROUP BY 1, 2),
         |t$i AS (SELECT a, b, n FROM p$i ORDER BY n DESC, a, b LIMIT 1),
         |v$i AS (
         |  SELECT list_reduce(string_split(sym,'|'),
         |           (acc, x) -> CASE WHEN x = t$i.b AND (acc = t$i.a OR ends_with(acc, '|' || t$i.a))
         |                            THEN acc || x ELSE acc || '|' || x END) AS sym, freq
         |  FROM v$p CROSS JOIN t$i)""".stripMargin
    }
    s"$v0,\n${steps.mkString(",\n")}"
  }

  private val bpeTrainDuck: String = {
    val sel = (1 to BpeSteps)
      .map(i => s"SELECT $i AS step, a AS lhs, b AS rhs, a || b AS merged, n FROM t$i")
      .mkString("\nUNION ALL ")
    s"WITH $bpeChainDuck\n" +
      s"SELECT CAST(step AS BIGINT) AS step, lhs, rhs, merged, n FROM ($sel) ORDER BY step"
  }

  /** Iterative BPE tokenizer training (Sennrich et al. shape), the
    * full loop q_bpe_pairs is the first step of: [[BpeSteps]]
    * sequential highest-count merges, each applied to the vocabulary
    * before the next count. Scale: ONE full-corpus pass builds the
    * distinct-word frequency vocab; every subsequent step touches only
    * the vocabulary (corpus-size-independent — the rollup is what
    * makes BPE trainable on 100 TB), merges are greedy left-to-right
    * per word (exact non-overlap fold), and driver state is one
    * (pair, count) row per step — the bounded driver-iteration rule.
    * Per-step vocab DataFrames are persisted and the predecessor
    * unpersisted once materialized, so lineage stays linear (no
    * 2^steps recompute) and no cache residue outlives the build.
    */
  /** The greedy left-to-right merge fold for one trained (a, b) pair,
    * as a SQL expression over the '|'-joined symbol string `inner`.
    * Symbols are [a-z]+ so the literals need no escaping. Shared by
    * the per-step rewrite in the training loop and the nested apply
    * chain in q_bpe_apply so the two folds cannot diverge.
    */
  private def mergeFoldSql(a: String, b: String, inner: String): String =
    s"""aggregate(split($inner, '\\\\|'), '', (acc, x) ->
       |  CASE WHEN acc = '' THEN x
       |       WHEN x = '$b' AND (acc = '$a' OR endswith(acc, '|$a')) THEN concat(acc, x)
       |       ELSE concat(acc, '|', x) END)""".stripMargin

  /** Distinct-word frequency vocabulary — the ONE full-corpus pass the
    * BPE loop is built on.
    */
  private def bpeWords(s: org.apache.spark.sql.SparkSession, d: String) =
    documents(s, d)
      .select(explode(expr(toks)).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Runs the [[BpeSteps]]-step training loop and returns the merge
    * table rows (step, lhs, rhs, merged, n). Driver state is one
    * (pair, count) row per step; per-step vocab DataFrames are
    * persisted and the predecessor unpersisted once materialized, so
    * lineage stays linear and no cache residue outlives the call.
    */
  private def trainBpeMerges(s: org.apache.spark.sql.SparkSession, d: String)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab = bpeWords(s, d).select(
      expr("array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), '|')")
        .as("sym"), col("freq"))
      .persist()
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (i <- 1 to BpeSteps) {
      val top = vocab
        .withColumn("syms", split(col("sym"), "\\|"))
        .select(explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  j -> struct(element_at(syms, j) AS a, element_at(syms, j + 1) AS b))""".stripMargin))
          .as("pr"), col("freq"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(lng(sum(col("freq"))).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect() // bounded driver state: exactly one row per step
      val r = top.head
      val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
      merges += ((i.toLong, a, b, a + b, n))
      val next = vocab
        .select(expr(mergeFoldSql(a, b, "sym")).as("sym"), col("freq"))
        .persist()
      next.count() // materialize before dropping the predecessor
      vocab.unpersist()
      vocab = next
    }
    vocab.unpersist()
    merges.result()
  }

  private val bpeTrain = QueryDef(
    "q_bpe_train",
    s"Iterative BPE training: $BpeSteps sequential merge steps over " +
      "the distinct-word frequency vocabulary; each step counts " +
      "adjacent symbol pairs (weighted by word frequency), merges the " +
      "top pair (ties: lexicographic), and rewrites the vocab with " +
      "the greedy left-to-right fold before the next count. The " +
      "oracle replays the identical loop as chained CTEs.",
    Some(bpeTrainDuck),
    (s, d) => {
      import s.implicits._
      trainBpeMerges(s, d).toDF("step", "lhs", "rhs", "merged", "n")
        .orderBy("step")
    }
  )

  // ------------------------------------------------------------- BPE apply

  private val bpeApplyDuck: String =
    s"WITH $bpeChainDuck\n" +
      s"""SELECT token, CAST(len(token) AS BIGINT) AS tok_len,
         |       CAST(sum(freq) AS BIGINT) AS n
         |FROM (SELECT unnest(string_split(sym, '|')) AS token, freq FROM v$BpeSteps) t
         |GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin

  /** Tokenizer APPLICATION — encode with the trained merges. Training
    * (q_bpe_train) yields an ordered merge list; applying it is a pure
    * function of (word, merges): char-split, then each merge's greedy
    * left-to-right fold IN TRAINING ORDER. Output is the resulting
    * token frequency table (top 30 by corpus frequency) — the
    * vocabulary a real tokenizer would ship.
    *
    * Scale: the merge list is trained on the vocabulary rollup (see
    * [[trainBpeMerges]]), then the encode is ONE pass over the
    * distinct-word vocab as a single select of [[BpeSteps]] nested
    * codegen'd folds — no joins, no per-step materialization, and the
    * corpus-sized stream is never touched after the initial rollup.
    * The oracle reuses the training chain's v[[BpeSteps]] CTE, so the
    * trained merges and the applied merges cannot desynchronize.
    */
  private val bpeApply = QueryDef(
    "q_bpe_apply",
    s"BPE tokenizer application: encode the distinct-word vocabulary " +
      s"with the $BpeSteps trained merges (applied in training order, " +
      "each as the greedy left-to-right fold) and report the top-30 " +
      "resulting tokens by frequency-weighted corpus count.",
    Some(bpeApplyDuck),
    (s, d) => {
      val merges = trainBpeMerges(s, d)
      val encoded = merges.foldLeft(
        "array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), '|')") {
        case (inner, (_, a, b, _, _)) => mergeFoldSql(a, b, inner)
      }
      bpeWords(s, d)
        .select(expr(encoded).as("sym"), col("freq"))
        .select(explode(split(col("sym"), "\\|")).as("token"), col("freq"))
        .groupBy("token")
        .agg(lng(sum(col("freq"))).as("n"))
        .select(col("token"), lng(length(col("token"))).as("tok_len"), col("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30)
    }
  )

  // ------------------------------------------------------------- unigram LM

  /** EM iteration count and seed-vocabulary budget for the unigram-LM
    * tokenizer. Small fixed constants: the loop cost is vocabulary-
    * sized (corpus-independent after the one word-rollup pass), and
    * both engines replay the identical iteration count.
    */
  private val UniIters = 3
  private val UniTopSubs = 40

  /** All words (no length floor — single-char words score the
    * single-char pieces), freq-weighted. The ONE corpus pass of the
    * unigram-LM loop, mirroring [[bpeWords]].
    */
  private def uniWords(s: org.apache.spark.sql.SparkSession, d: String) =
    documentsSpread(s, d)
      .select(explode(expr(toks)).as("w"))
      .groupBy("w").agg(lng(count(lit(1))).as("freq"))

  /** SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
    * hard-EM variant): seed vocab = all single chars + the top
    * [[UniTopSubs]] substrings of length 2–4 by freq-weighted count;
    * each EM iteration turns counts into integer Viterbi costs
    * (−ln p rounded once on the 1e-6 grid — the q_perplexity ln-grid
    * discipline, so DP sums and comparisons are exact BIGINT
    * arithmetic with no float-accumulation surface), segments every
    * vocabulary word by min-cost DP (tie → shorter piece), and
    * re-estimates counts from the freq-weighted segment usage with
    * add-one smoothing (all pieces stay alive, so the single-char
    * fallback keeps every word segmentable forever).
    */
  /** Integer Viterbi cost table from the driver-side (piece, count)
    * vocab: −ln(c/Σc) rounded once on the 1e-6 grid. Rounding goes
    * through java.math.BigDecimal.valueOf(..).setScale(0, HALF_UP) —
    * the exact implementation of Spark's round(double, 0) — so the
    * costs are bit-identical to what the SQL expression produced and
    * to DuckDB's round() on positive values.
    */
  private def uniCostMap(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val tot = vocab.iterator.map(_._2).sum.toDouble
    vocab.map { case (p, c) =>
      p -> java.math.BigDecimal.valueOf(-math.log(c / tot) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }.toMap
  }

  /** Min-cost Viterbi segmentation of every vocab word under the
    * broadcast cost map: one tight integer DP per word inside a
    * mapPartitions batch pass. This is deliberately NOT a SQL
    * higher-order-function fold: HOFs evaluate interpreted (no
    * codegen), and CollapseProject inlines a referenced projection
    * into EVERY reference site — a cands->dp->backtrack expression
    * chain re-evaluates the whole upstream fold at each of the O(L)
    * reference points, an O(L²) interpreted blowup measured at 10.9 s
    * (and worse) at sf0.1 for what is milliseconds of integer work.
    * Per-row imperative DP is exactly the mapPartitions carve-out;
    * determinism is engine-independent: integer costs from
    * [[uniCostMap]], min-cost with ties to the shorter piece
    * (candidates scanned in ascending length, strict improvement
    * required), identical to the oracle's (cost, len) struct-min.
    */
  private def uniSegment(words: org.apache.spark.sql.DataFrame,
                         costMap: Map[String, Long])
      : org.apache.spark.sql.DataFrame = {
    val s = words.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(costMap)
    words.select(col("w"), col("freq")).as[(String, Long)]
      .mapPartitions { it =>
        val cm = bc.value
        it.map { case (w, freq) =>
          val L = w.length
          val best = Array.fill(L + 1)(Long.MaxValue)
          val blen = new Array[Int](L + 1)
          best(0) = 0L
          var i = 1
          while (i <= L) {
            var l = 1
            while (l <= 4 && l <= i) {
              if (best(i - l) != Long.MaxValue) {
                cm.get(w.substring(i - l, i)) match {
                  case Some(c) =>
                    val v = best(i - l) + c
                    if (v < best(i)) { best(i) = v; blen(i) = l }
                  case None => ()
                }
              }
              l += 1
            }
            i += 1
          }
          val ps = List.newBuilder[String]
          var pos = L
          // blen(pos) == 0 is impossible while single-char pieces stay
          // in the vocab (add-one smoothing); the guard keeps a future
          // pruning change from looping instead of failing loud
          while (pos > 0 && blen(pos) > 0) {
            val l = blen(pos)
            ps += w.substring(pos - l, pos)
            pos -= l
          }
          (w, freq, ps.result())
        }
      }.toDF("w", "freq", "pieces")
  }

  /** Hard-EM driver loop. Altitude rationale (the q_mmr_rerank /
    * q_bpe_train lesson): the vocab is a CONSTANT ≤ 26+UniTopSubs
    * pieces regardless of corpus size, so per-iteration state lives on
    * the driver (one ≤66-row collect) and the distributed work per
    * iteration is exactly ONE job — a narrow map-side segmentation
    * pass over the persisted word rollup feeding a piece-count
    * groupBy. The first draft instead re-exploded candidates and
    * joined a cost TABLE per iteration: 4-5 shuffling jobs per round,
    * 10.9 s at sf0.1 — pure job-count overhead for vocab-sized data;
    * this shape runs the same math in ~2 s. The NLL needs no extra
    * pass at all: Σ_w freq·cost(seg(w)) ≡ Σ_p obs(p)·cost(p).
    *
    * Returns (final (piece, count) vocab, NLL per iteration in 1e-6
    * nats).
    */
  private[graft] def trainUnigram(s: org.apache.spark.sql.SparkSession, d: String)
      : (Seq[(String, Long)], Seq[Long]) = {
    val words = uniWords(s, d).persist()
    val singles = words.select(explode(expr(
      "transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("piece"),
      col("freq"))
      .groupBy("piece").agg(lng(sum(col("freq"))).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq // <= alphabet
    val multis = words.select(explode(expr(
      """flatten(transform(sequence(1, length(w)), i ->
        |  filter(transform(sequence(2, 4), l ->
        |    CASE WHEN i + l - 1 <= length(w) THEN substring(w, i, l) END),
        |    x -> x IS NOT NULL)))""".stripMargin)).as("piece"), col("freq"))
      .groupBy("piece").agg(lng(sum(col("freq"))).as("c"))
      .orderBy(col("c").desc, col("piece")).limit(UniTopSubs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq // <= UniTopSubs rows
    var vocab: Seq[(String, Long)] = singles ++ multis
    val nlls = Seq.newBuilder[Long]
    for (_ <- 1 to UniIters) {
      val cm = uniCostMap(vocab)
      // bounded driver state: one <= vocab-sized (piece, count) collect
      val obs = uniSegment(words, cm)
        .select(explode(col("pieces")).as("piece"), col("freq"))
        .groupBy("piece").agg(lng(sum(col("freq"))).as("oc"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      nlls += vocab.iterator.map { case (p, _) => obs.getOrElse(p, 0L) * cm(p) }.sum
      vocab = vocab.map { case (p, _) => p -> (obs.getOrElse(p, 0L) + 1L) }
    }
    words.unpersist()
    (vocab, nlls.result())
  }
  /** DuckDB replay of the identical EM chain (the bpeTrainDuck
    * convention: each iteration is one CTE layer).
    *
    * DuckDB 1.0 `list_reduce` hazard, learned the hard way: a lambda
    * inside list_reduce that references an OUTER COLUMN of the row
    * (another list column, or the string column) reads a different
    * row's value when rows in a vector chunk carry different list
    * lengths — 'spark' was segmented with 'row''s DP table, and only
    * on full-chunk runs (single-row filters compute correctly, and
    * results vary run to run). Same family of bug: a conditional
    * `CASE WHEN .. THEN acc ELSE list_append(acc, ..) END` control
    * shape misaligns, and a list field nested inside a struct
    * accumulator does not accumulate. The rules encoded here:
    * every list_reduce lambda references ONLY its own parameters
    * (everything the fold needs — candidate back-indices, costs,
    * piece strings, the dp table for the backtrack — is packed into
    * the reduced list's elements by an outer list_transform, which IS
    * chunk-safe), the accumulator is a flat list of structs, and every
    * step unconditionally list_appends (freeze via per-field CASE).
    * r10 addendum (q_hmm_viterbi): a plain STRUCT accumulator is
    * ALSO unsafe — a parameter-only min-plus lambda over a struct
    * {a, b} accumulator returned different cost tables across
    * sessions on identical input; flattening the accumulator to a
    * BIGINT list (emissions precomputed per element by the outer
    * transform) restored determinism. The rule stands: list
    * accumulators only.
    */
  private def uniDuckChain(extraSegLayer: Boolean): String = {
    // acc entries: {'c': best cost, 'l': piece len, 'piece': piece};
    // element t: position t's candidates as {'c': acc back-index,
    // 'l': cost, 'piece': piece} — same struct type, fields reused.
    val dpFold =
      """list_reduce(
        |  list_prepend([{'c': CAST(0 AS BIGINT), 'l': CAST(0 AS BIGINT), 'piece': ''}], cgrp),
        |  (acc, x) -> list_append(acc,
        |    list_aggregate(list_transform(x, cd ->
        |      {'c': acc[CAST(cd.c AS INT)].c + cd.l, 'l': CAST(len(cd.piece) AS BIGINT), 'piece': cd.piece}), 'min')))""".stripMargin
    // every element is the whole (len, piece)-encoded dp table, so the
    // walk reads it from the parameter, never from the outer row
    val backtrack =
      """list_transform(list_filter(
        |  list_reduce(
        |    list_prepend([{'pos': CAST(len(w) AS BIGINT), 'piece': ''}],
        |      list_transform(generate_series(CAST(1 AS BIGINT), CAST(len(w) AS BIGINT)), i -> dpp)),
        |    (st, x) -> list_append(st,
        |      {'pos': CASE WHEN st[len(st)].pos <= 0 THEN st[len(st)].pos
        |              ELSE st[len(st)].pos - x[CAST(st[len(st)].pos + 1 AS INT)].pos END,
        |       'piece': CASE WHEN st[len(st)].pos <= 0 THEN ''
        |                ELSE x[CAST(st[len(st)].pos + 1 AS INT)].piece END})),
        |  e -> e.piece <> ''), e -> e.piece)""".stripMargin
    val seed = Seq(
      """words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
        |  SELECT unnest(regexp_extract_all(lower(text),'([a-z]+)',1)) AS w FROM documents) s GROUP BY w)""".stripMargin,
      """singles AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS c FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(w)), i -> substr(w, CAST(i AS INT), 1))) AS piece, freq
        |  FROM words) s GROUP BY piece)""".stripMargin,
      s"""multis AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS c FROM (
         |  SELECT unnest(flatten(list_transform(generate_series(1, len(w)), i ->
         |    list_filter(list_transform([2,3,4], l -> CASE WHEN i + l - 1 <= len(w) THEN substr(w, CAST(i AS INT), CAST(l AS INT)) END),
         |      x -> x IS NOT NULL)))) AS piece, freq
         |  FROM words) s GROUP BY piece ORDER BY c DESC, piece LIMIT $UniTopSubs)""".stripMargin,
      "v0 AS (SELECT * FROM singles UNION ALL SELECT * FROM multis)")
    // one segmentation layer: costs from v{t-1}, candidates, DP,
    // backtrack. The update half (obs/v) is omitted for the final
    // apply layer, which only needs seg.
    def segLayer(t: Int): Seq[String] = {
      val p = t - 1
      Seq(
        s"""cost$t AS (SELECT piece,
           |  CAST(round(-ln(CAST(c AS DOUBLE)/(SELECT sum(c) FROM v$p))*1e6) AS BIGINT) AS cost FROM v$p)""".stripMargin,
        s"""grp$t AS (SELECT w, freq, list_sort(list({'i': CAST(i AS BIGINT), 'len': CAST(l AS BIGINT), 'cost': cost})) AS cands
           |  FROM (SELECT s.w, s.freq, s.i, s.l, k.cost FROM (
           |    SELECT w, freq, u.i AS i, v.l AS l, substr(w, CAST(u.i - v.l + 1 AS INT), CAST(v.l AS INT)) AS piece
           |    FROM words, unnest(generate_series(1, len(w))) AS u(i), unnest([1,2,3,4]) AS v(l)
           |    WHERE v.l <= u.i) s JOIN cost$t k USING (piece)) sq GROUP BY w, freq)""".stripMargin,
        s"""pre$t AS (SELECT w, freq,
           |  list_transform(generate_series(CAST(1 AS BIGINT), CAST(len(w) AS BIGINT)), i ->
           |    list_transform(list_filter(cands, cd -> cd.i = i),
           |      cd -> {'c': i - cd.len + 1, 'l': cd.cost,
           |              'piece': substr(w, CAST(i - cd.len + 1 AS INT), CAST(cd.len AS INT))})) AS cgrp
           |  FROM grp$t)""".stripMargin,
        s"dp$t AS (SELECT w, freq, $dpFold AS dp FROM pre$t)",
        s"enc$t AS (SELECT w, freq, list_transform(dp, e -> {'pos': e.l, 'piece': e.piece}) AS dpp FROM dp$t)",
        s"seg$t AS (SELECT w, freq, $backtrack AS pieces FROM enc$t)")
    }
    def updateLayer(t: Int): Seq[String] = {
      val p = t - 1
      Seq(
        s"""obs$t AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS oc FROM (
           |  SELECT unnest(pieces) AS piece, freq FROM seg$t) s GROUP BY piece)""".stripMargin,
        s"""v$t AS (SELECT piece, CAST(sum(cnt) + 1 AS BIGINT) AS c FROM (
           |  SELECT piece, CAST(0 AS BIGINT) AS cnt FROM v$p
           |  UNION ALL SELECT piece, oc AS cnt FROM obs$t) u GROUP BY piece)""".stripMargin)
    }
    val iters = (1 to UniIters).flatMap(t => segLayer(t) ++ updateLayer(t)) ++
      (if (extraSegLayer) segLayer(UniIters + 1) else Seq.empty)
    "WITH " + (seed ++ iters).mkString(",\n")
  }

  private val unigramDuck: String =
    uniDuckChain(extraSegLayer = false) +
      s"""
         |SELECT piece, c AS n, round(CAST(c AS DOUBLE)/(SELECT sum(c) FROM v$UniIters), 6) AS p6
         |FROM v$UniIters ORDER BY n DESC, piece LIMIT 30""".stripMargin

  private val unigramApplyDuck: String =
    uniDuckChain(extraSegLayer = true) +
      s"""
         |SELECT token, CAST(len(token) AS BIGINT) AS tok_len, CAST(sum(freq) AS BIGINT) AS n
         |FROM (SELECT unnest(pieces) AS token, freq FROM seg${UniIters + 1}) s
         |GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin

  private val unigramLm = QueryDef(
    "q_unigram_lm",
    s"Unigram-LM (SentencePiece-style) tokenizer training, hard-EM: " +
      s"seed vocab = single chars + top-$UniTopSubs length-2..4 " +
      s"substrings; $UniIters EM iterations of integer-cost Viterbi " +
      "segmentation (costs = -ln p on the 1e-6 grid, tie -> shorter " +
      "piece) and add-one re-estimation; output = top-30 final pieces " +
      "with counts and 6-decimal probabilities.",
    Some(unigramDuck),
    (s, d) => {
      import s.implicits._
      val (vocab, _) = trainUnigram(s, d)
      val tot = vocab.iterator.map(_._2).sum.toDouble
      // p6 via BigDecimal.valueOf HALF_UP — Spark's round(double, 6)
      vocab.map { case (p, c) =>
        (p, c, java.math.BigDecimal.valueOf(c / tot)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      }.toDF("piece", "n", "p6")
        .orderBy(col("n").desc, col("piece"))
        .limit(30)
    }
  )

  /** Tokenizer APPLICATION for the unigram LM — encode the corpus with
    * the trained vocabulary (the q_bpe_apply counterpart): one more
    * Viterbi segmentation pass over the word rollup using the FINAL
    * trained costs, reported as the top-30 resulting tokens by
    * freq-weighted corpus count. The segmentation is the same shared
    * [[uniSegment]] the training loop ran (train and apply cannot
    * diverge), and the oracle reuses the training chain's CTEs plus
    * one extra seg layer. Scale: identical to one EM iteration —
    * vocabulary-sized, corpus untouched after the rollup.
    */
  private val unigramApply = QueryDef(
    "q_unigram_apply",
    "Unigram-LM tokenizer application: Viterbi-encode the distinct-" +
      "word vocabulary with the trained piece costs (same DP as " +
      "training, tie -> shorter piece) and report the top-30 " +
      "resulting tokens by frequency-weighted corpus count.",
    Some(unigramApplyDuck),
    (s, d) => {
      val (vocab, _) = trainUnigram(s, d)
      uniSegment(uniWords(s, d), uniCostMap(vocab))
        .select(explode(col("pieces")).as("token"), col("freq"))
        .groupBy("token").agg(lng(sum(col("freq"))).as("n"))
        .select(col("token"), lng(length(col("token"))).as("tok_len"), col("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30)
    }
  )

  // -------------------------------------------------------------- wordpiece

  /** DuckDB twin of the WordPiece greedy encoder. Reuses the unigram
    * chain's seed CTEs (words / singles / multis — the vocab is the
    * same chars + top-[[UniTopSubs]] substrings, which makes the
    * greedy-vs-Viterbi comparison across q_wordpiece / q_unigram_apply
    * an apples-to-apples one), then: per (word, position) the longest
    * vocab match is a join + max — OUTSIDE any lambda — and the greedy
    * walk is a list_reduce whose lambda reads only its parameters
    * (the per-position {ml, piece} table is packed into every reduced
    * element by an outer list_transform — the uniDuckChain
    * chunk-safety rules, learned from the DuckDB 1.0 list_reduce
    * outer-column hazard documented there).
    */
  private val wordpieceDuck: String =
    s"""WITH words AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |  SELECT unnest(regexp_extract_all(lower(text),'([a-z]+)',1)) AS w FROM documents) s GROUP BY w),
       |singles AS (SELECT DISTINCT piece FROM (
       |  SELECT unnest(list_transform(generate_series(1, len(w)), i -> substr(w, CAST(i AS INT), 1))) AS piece
       |  FROM words) s),
       |multis AS (SELECT piece FROM (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS c FROM (
       |    SELECT unnest(flatten(list_transform(generate_series(1, len(w)), i ->
       |      list_filter(list_transform([2,3,4], l -> CASE WHEN i + l - 1 <= len(w) THEN substr(w, CAST(i AS INT), CAST(l AS INT)) END),
       |        x -> x IS NOT NULL)))) AS piece, freq
       |    FROM words) s GROUP BY piece ORDER BY c DESC, piece LIMIT $UniTopSubs) t),
       |vocab AS (SELECT piece FROM singles UNION SELECT piece FROM multis),
       |cand AS (SELECT s.w, s.i, max(s.l) AS ml FROM (
       |  SELECT w, u.i AS i, v.l AS l,
       |         substr(w, CAST(u.i AS INT), CAST(v.l AS INT)) AS piece
       |  FROM words, unnest(generate_series(1, len(w))) AS u(i), unnest([1,2,3,4]) AS v(l)
       |  WHERE u.i + v.l - 1 <= len(w)) s
       |  JOIN vocab USING (piece) GROUP BY s.w, s.i),
       |plist AS (SELECT w, freq,
       |  list_transform(list_sort(list({'i': i, 'ml': ml})), e ->
       |    {'pos': CAST(e.ml AS BIGINT),
       |     'piece': substr(w, CAST(e.i AS INT), CAST(e.ml AS INT))}) AS ps
       |  FROM cand JOIN words USING (w) GROUP BY w, freq),
       |walk AS (SELECT w, freq,
       |  list_reduce(
       |    list_prepend([{'pos': CAST(1 AS BIGINT), 'piece': ''}],
       |      list_transform(generate_series(CAST(1 AS BIGINT), CAST(len(w) AS BIGINT)), i -> ps)),
       |    (st, x) -> list_append(st,
       |      {'pos': CASE WHEN st[len(st)].pos > len(x) THEN st[len(st)].pos
       |              ELSE st[len(st)].pos + x[CAST(st[len(st)].pos AS INT)].pos END,
       |       'piece': CASE WHEN st[len(st)].pos > len(x) THEN ''
       |                WHEN st[len(st)].pos > 1 THEN '##' || x[CAST(st[len(st)].pos AS INT)].piece
       |                ELSE x[CAST(st[len(st)].pos AS INT)].piece END})) AS st
       |  FROM plist),
       |toks AS (SELECT freq,
       |  unnest(list_filter(list_transform(st, e -> e.piece), p -> p <> '')) AS token
       |  FROM walk)
       |SELECT token,
       |  CAST(CASE WHEN token LIKE '##%' THEN len(token) - 2 ELSE len(token) END AS BIGINT) AS tok_len,
       |  CAST(sum(freq) AS BIGINT) AS n
       |FROM toks GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin

  /** WordPiece-style greedy encoder — the third tokenizer family next
    * to BPE (ordered merges, q_bpe_apply) and unigram-LM (Viterbi
    * min-cost, q_unigram_apply): longest-match-first left-to-right
    * segmentation against a subword vocabulary, interior pieces marked
    * with the `##` continuation prefix (the BERT convention). The
    * vocabulary is the SAME seed as the unigram tokenizer (all single
    * chars + the top-[[UniTopSubs]] length-2–4 substrings by
    * freq-weighted count), so the three applications differ only in
    * segmentation algorithm — the comparison a tokenizer bake-off
    * actually wants.
    *
    * Determinism: vocab selection ties break lexicographically; the
    * greedy walk is a pure function of (word, vocab); single chars are
    * always in the vocab, so every word segments.
    *
    * Scale (the q_unigram_apply altitude): ONE corpus pass builds the
    * distinct-word rollup; the vocab is two bounded collects (alphabet
    * + [[UniTopSubs]] rows); the greedy scan is a per-row integer loop
    * in one mapPartitions batch over the word rollup — corpus-sized
    * work never touches the vocab machinery.
    */
  private val wordpiece = QueryDef(
    "q_wordpiece",
    "WordPiece greedy tokenizer: longest-match-first segmentation of " +
      "the distinct-word vocabulary against the chars + top-" +
      s"$UniTopSubs-substring vocab, interior pieces ##-prefixed; " +
      "top-30 resulting tokens by frequency-weighted corpus count.",
    Some(wordpieceDuck),
    (s, d) => {
      import s.implicits._
      val words = uniWords(s, d).persist()
      // bounded collects: alphabet-sized + UniTopSubs rows (the
      // trainUnigram seed discipline)
      val singles = words.select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
          .as("piece"))
        .distinct().collect().map(_.getString(0))
      val multis = words.select(explode(expr(
        """flatten(transform(sequence(1, length(w)), i ->
          |  filter(transform(sequence(2, 4), l ->
          |    CASE WHEN i + l - 1 <= length(w) THEN substring(w, i, l) END),
          |    x -> x IS NOT NULL)))""".stripMargin)).as("piece"), col("freq"))
        .groupBy("piece").agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("piece")).limit(UniTopSubs)
        .collect().map(_.getString(0))
      val bc = s.sparkContext.broadcast((singles ++ multis).toSet)
      val toks = words.select(col("w"), col("freq")).as[(String, Long)]
        .mapPartitions { it =>
          val v = bc.value
          it.flatMap { case (w, freq) =>
            val out = List.newBuilder[(String, Long, Long)]
            var pos = 0
            val L = w.length
            while (pos < L) {
              var l = math.min(4, L - pos)
              while (l > 1 && !v.contains(w.substring(pos, pos + l))) l -= 1
              val raw = w.substring(pos, pos + l)
              out += ((if (pos > 0) "##" + raw else raw, l.toLong, freq))
              pos += l
            }
            out.result()
          }
        }.toDF("token", "tok_len", "freq")
      toks.groupBy("token", "tok_len")
        .agg(lng(sum("freq")).as("n"))
        .select(col("token"), lng(col("tok_len")).as("tok_len"), col("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30)
    }
  )

  val defs: Seq[QueryDef] = Seq(keywords, sentences, featureHash, bpePairs,
    bpeTrain, bpeApply, unigramLm, unigramApply, wordpiece)
}
