package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables._
import graft.util.Det._

/** ML-evaluation operators over the labeled embedding corpus plus two
  * corpus-statistics screens (SURVEY.md §2.19): class weighting, k-NN
  * classification, nearest-centroid confusion matrix, simplified
  * silhouette, a power-law (Zipf) fit of sales counts, and pointwise
  * mutual information.
  *
  * Determinism (SURVEY.md §7.5): label centroids and all centroid
  * distances are INTEGER-exact — 1e10-scaled BIGINT component sums and
  * 1e12-scaled BIGINT distance-term sums (floor(x+0.5) scaling; see
  * [[CentroidSql]] for why wide decimals are banned here) — so nothing
  * depends on float accumulation order or decimal→double conversion;
  * log/sqrt chains are applied once to exact aggregates and rounded.
  *
  * Scale shapes (PLANS.md): centroids and class stats are ≤ labels
  * rows and ride broadcasts; the k-NN probe set is a fixed fraction of
  * the corpus broadcast against a partition-parallel scan (the
  * q_ann_cosine design); argmin/vote windows partition by probe or
  * vector id, never globally.
  */
object MlEvalQueries {

  // ------------------------------------------------------------ class weights

  private val classWeights = QueryDef(
    "q_class_weights",
    "Inverse-frequency class weights over the labeled embedding " +
      "corpus — the imbalance correction computed before training " +
      "(weight = N / (K·n_label), sklearn's 'balanced' convention). " +
      "One aggregation to K rows; N and K ride a broadcast; weight " +
      "and share are single double divisions of exact BIGINTs.",
    Some("""WITH l AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
           |t AS (SELECT sum(n) AS total, count(*) AS k FROM l)
           |SELECT CAST(l.label AS BIGINT) AS label, CAST(l.n AS BIGINT) AS n,
           |       round(CAST(l.n AS DOUBLE) / t.total, 6) AS share,
           |       round(CAST(t.total AS DOUBLE) / (t.k * l.n), 6) AS weight
           |FROM l, t ORDER BY label""".stripMargin),
    (s, d) => {
      val l = embeddings(s, d).groupBy("label").agg(count(lit(1)).as("n"))
      val t = l.agg(sum("n").as("total"), count(lit(1)).as("k"))
      l.crossJoin(broadcast(t))
        .select(lng(col("label")).as("label"), lng(col("n")).as("n"),
          round(dbl(col("n")) / col("total"), 6).as("share"),
          round(dbl(col("total")) / (col("k") * col("n")), 6).as("weight"))
        .orderBy("label")
    }
  )

  // ------------------------------------------------------------ knn classify

  private val knnClassify = QueryDef(
    "q_knn_classify",
    "Leave-one-out 5-NN majority-vote classification of a " +
      "deterministic probe subset (vec_id mod 25 = 0, capped at " +
      "vec_id < 10000 → ≤ 400 probes regardless of corpus size): each " +
      "probe's 5 nearest neighbours by squared L2 (exact sequential " +
      "fold, ties to lowest cand_id) vote; the majority label wins, " +
      "ties to the lowest label. The cap is what makes the broadcast " +
      "CONSTANT-bounded (q_ann_cosine design) — a pure mod filter " +
      "would grow the broadcast linearly with the corpus; both the " +
      "top-5 cut and the vote are probe-partitioned windows over " +
      "≤ corpus and ≤ 5 rows respectively.",
    Some("""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe, label AS true_label
           |           FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < 10000),
           |d AS (SELECT p.probe_id, p.true_label, e.vec_id AS cand_id, e.label AS cand_label,
           |        list_sum(list_transform(list_zip(p.pe, e.embedding),
           |          q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE)) * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE)))) AS d2
           |      FROM p JOIN embeddings e ON e.vec_id <> p.probe_id),
           |nn AS (SELECT probe_id, true_label, cand_label,
           |         row_number() OVER (PARTITION BY probe_id ORDER BY d2, cand_id) AS rn
           |       FROM d),
           |v AS (SELECT probe_id, true_label, cand_label, count(*) AS votes
           |      FROM nn WHERE rn <= 5 GROUP BY 1, 2, 3),
           |w AS (SELECT probe_id, true_label, cand_label AS pred_label, votes,
           |        row_number() OVER (PARTITION BY probe_id ORDER BY votes DESC, cand_label) AS wr
           |      FROM v)
           |SELECT probe_id, CAST(true_label AS BIGINT) AS true_label,
           |       CAST(pred_label AS BIGINT) AS pred_label,
           |       CAST(votes AS BIGINT) AS votes
           |FROM w WHERE wr = 1 ORDER BY probe_id""".stripMargin),
    (s, d) => {
      val e = embeddings(s, d)
      val p = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 10000)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("label").as("true_label"))
      val cand = e.select(col("vec_id").as("cand_id"),
        col("embedding").as("ce"), col("label").as("cand_label"))
      val dd = cand.join(broadcast(p), col("cand_id") =!= col("probe_id"))
        .select(col("probe_id"), col("true_label"), col("cand_id"),
          col("cand_label"), l2sq("pe", "ce").as("d2"))
      val wNn = Window.partitionBy("probe_id").orderBy(col("d2"), col("cand_id"))
      val votes = dd.withColumn("rn", row_number().over(wNn))
        .filter(col("rn") <= 5)
        .groupBy("probe_id", "true_label", "cand_label")
        .agg(count(lit(1)).as("votes"))
      val wVote = Window.partitionBy("probe_id")
        .orderBy(col("votes").desc, col("cand_label"))
      votes.withColumn("wr", row_number().over(wVote))
        .filter(col("wr") === 1)
        .select(col("probe_id"), lng(col("true_label")).as("true_label"),
          lng(col("cand_label")).as("pred_label"), lng(col("votes")).as("votes"))
        .orderBy("probe_id")
    }
  )

  // ---------------------------------------------------- centroid confusion

  /** Shared SQL for the per-label, per-dimension centroid table
    * (1-indexed dims to match DuckDB's generate_series form).
    *
    * Fully integer-exact: components accumulate as 1e10-scaled BIGINTs
    * and the mean rounds to 1e9 units via floor(x + 0.5) on a < 2^53
    * double — NO decimal→double casts anywhere (engines convert wide
    * decimals to double with different intermediate roundings, and a
    * round-9 landing on a tie then shifts a centroid by 1e-9; q_pr_curve
    * exposed exactly that). c_e9/1e9 is an exact small-integer double.
    */
  private[queries] val CentroidSql =
    """SELECT label AS clabel, ord AS dim,
      |       CAST(floor(CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 10000000000 + 0.5) AS BIGINT)) AS DOUBLE) / (10.0 * count(*)) + 0.5) AS BIGINT) AS c_e9
      |FROM (SELECT label, unnest(generate_series(1, len(embedding))) AS ord,
      |             unnest(embedding) AS val
      |      FROM embeddings)
      |GROUP BY 1, 2""".stripMargin

  /** Shared SQL term for one squared-distance picocount contribution
    * (BIGINT; sum then divide by 1e12 once — int64→double conversion is
    * correctly rounded in both engines, unlike wide decimals).
    */
  private[queries] val DistTermSql =
    "CAST(floor((CAST(el.v AS DOUBLE) - CAST(cent.c_e9 AS DOUBLE) / 1000000000.0) * (CAST(el.v AS DOUBLE) - CAST(cent.c_e9 AS DOUBLE) / 1000000000.0) * 1000000000000 + 0.5) AS BIGINT)"

  private val centroidConfusion = QueryDef(
    "q_centroid_confusion",
    "Nearest-centroid classifier confusion matrix: per-label mean " +
      "vectors (integer-exact: 1e10-scaled BIGINT component sums, one " +
      "rounded division to 1e9 units) classify every vector by " +
      "smallest squared distance (per-dimension picocount terms " +
      "summed as exact BIGINT — cross-dimension order cannot matter; " +
      "ties to lowest " +
      "label), and the (true, predicted) matrix is counted. Shape: the " +
      "K×dims centroid table is one map-side-combined aggregation of " +
      "the exploded corpus, reassembled into K arrays and broadcast; " +
      "each vector then scores K distances with ONE sequential " +
      "zip_with fold per centroid (exact DECIMAL accumulation — " +
      "addition order still cannot matter) instead of re-exploding " +
      "the corpus ×K; the argmin is a vec_id-partitioned window over " +
      "K candidates; the matrix is ≤ K² rows.",
    Some(s"""WITH cent AS ($CentroidSql),
            |el AS (SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS dim,
            |              unnest(embedding) AS v
            |       FROM embeddings),
            |dist AS (SELECT el.vec_id, el.label AS true_label, cent.clabel,
            |           sum($DistTermSql) AS d2
            |         FROM el JOIN cent USING (dim) GROUP BY 1, 2, 3),
            |pred AS (SELECT vec_id, true_label, clabel,
            |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
            |         FROM dist)
            |SELECT CAST(true_label AS BIGINT) AS true_label,
            |       CAST(clabel AS BIGINT) AS pred_label,
            |       CAST(count(*) AS BIGINT) AS n
            |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val dist = centroidDistances(s, d)
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
      dist.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("true_label", "clabel")
        .agg(lng(count(lit(1))).as("n"))
        .select(lng(col("true_label")).as("true_label"),
          lng(col("clabel")).as("pred_label"), col("n"))
        .orderBy("true_label", "pred_label")
    }
  )

  /** Shared Spark shape for the exact-decimal vector↔centroid distance
    * table: per-dimension DECIMAL(20,10) centroid sums (exploded once),
    * reassembled into K dim-ordered arrays, broadcast, then one
    * sequential zip_with fold per (vector, centroid) accumulating
    * round-12 DECIMAL terms — value-identical to the oracle's
    * unnest-join-group sum (decimal addition is exact, so order is
    * irrelevant), at 1/dims the row count.
    */
  private[queries] def centroidDistances(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val el = embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim0", "v")))
      .select(col("label"), (col("dim0") + 1).as("dim"), col("v"))
    // integer-exact centroid: 1e10-scaled BIGINT component sums, mean
    // rounded to 1e9 units via floor(x + 0.5) on a < 2^53 double — no
    // decimal→double cast anywhere (see CentroidSql scaladoc)
    val cent = el.groupBy(col("label").as("clabel"), col("dim"))
      .agg(floor(dbl(sum(floor(dbl(col("v")) * 10000000000L + 0.5)
          .cast("long"))) / (count(lit(1)) * 10.0) + 0.5)
        .cast("long").as("c_e9"))
    val centArr = cent
      .groupBy("clabel")
      .agg(expr("transform(sort_array(collect_list(struct(dim, c_e9)))," +
        " t -> CAST(t.c_e9 AS DOUBLE) / 1000000000.0)").as("carr"))
    // the fold stage is CPU-bound (dims × K ops per vector) on a skinny
    // scan that may arrive in very few partitions — spread it before the
    // broadcast join; the shuffled payload is just the vectors
    embeddings(s, d)
      .select(col("vec_id"), col("label").as("true_label"), col("embedding"))
      .repartition(s.sparkContext.defaultParallelism)
      .crossJoin(broadcast(centArr))
      .select(col("vec_id"), col("true_label"), col("clabel"),
        expr(
          """aggregate(
            |  zip_with(embedding, carr,
            |    (x, y) -> CAST(floor((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) * 1000000000000 + 0.5) AS BIGINT)),
            |  0L, (acc, e) -> acc + e)""".stripMargin)
          .as("d2"))
  }

  // -------------------------------------------------------------- silhouette

  private val silhouette = QueryDef(
    "q_silhouette",
    "Simplified (centroid-based) silhouette per label: for each " +
      "vector, a = distance to its own label centroid, b = distance " +
      "to the nearest other centroid, s = (b−a)/max(a,b); reported as " +
      "the per-label mean — the cluster-quality readout over the " +
      "labeled corpus. Distances reuse the q_centroid_confusion " +
      "discipline (round-12 DECIMAL term sums, sqrt once, round-9); " +
      "per-vector s values are rounded to 9 decimals and summed as " +
      "exact DECIMAL for the mean. Same broadcast-centroid shape; the " +
      "a/b split is a conditional aggregation over the K distances " +
      "per vector — no second window.",
    Some(s"""WITH cent AS ($CentroidSql),
            |el AS (SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS dim,
            |              unnest(embedding) AS v
            |       FROM embeddings),
            |dist AS (SELECT el.vec_id, el.label AS true_label, cent.clabel,
            |           sqrt(CAST(sum($DistTermSql) AS DOUBLE) / 1000000000000.0) AS dd
            |         FROM el JOIN cent USING (dim) GROUP BY 1, 2, 3),
            |ab AS (SELECT vec_id, true_label,
            |         min(CASE WHEN clabel = true_label THEN dd END) AS a,
            |         min(CASE WHEN clabel <> true_label THEN dd END) AS b
            |       FROM dist GROUP BY 1, 2),
            |sv AS (SELECT vec_id, true_label,
            |         CAST(round((b - a) / greatest(a, b), 9) AS DECIMAL(18,9)) AS sil
            |       FROM ab)
            |SELECT CAST(true_label AS BIGINT) AS label,
            |       CAST(count(*) AS BIGINT) AS n,
            |       round(CAST(sum(sil) AS DOUBLE) / count(*), 6) AS mean_silhouette
            |FROM sv GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val dist = centroidDistances(s, d)
        .select(col("vec_id"), col("true_label"), col("clabel"),
          sqrt(dbl(col("d2")) / 1000000000000L).as("dd"))
      val ab = dist.groupBy("vec_id", "true_label")
        .agg(min(when(col("clabel") === col("true_label"), col("dd"))).as("a"),
          min(when(col("clabel") =!= col("true_label"), col("dd"))).as("b"))
      val sil = round((col("b") - col("a")) / greatest(col("a"), col("b")), 9)
        .cast(DecimalType(18, 9))
      ab.select(col("true_label"), sil.as("sil"))
        .groupBy("true_label")
        .agg(lng(count(lit(1))).as("n"),
          round(dbl(sum(col("sil"))) / count(lit(1)), 6).as("mean_silhouette"))
        .select(lng(col("true_label")).as("label"), col("n"),
          col("mean_silhouette"))
        .orderBy("label")
    }
  )

  // ---------------------------------------------------------------- powerlaw

  private val powerlaw = QueryDef(
    "q_powerlaw",
    "Power-law (Zipf) fit of part sales-count distribution: per-part " +
      "order counts bucketed by binary order of magnitude (bucket = " +
      "bit-length − 1 via base-2 string — exact integer arithmetic, no " +
      "log ties), plus the continuous-MLE exponent alpha = 1 + n / " +
      "Σ ln(x/0.5) computed from round-9 DECIMAL ln sums — the " +
      "heavy-tail screen run before deciding skew strategies. One " +
      "fact aggregation to per-part counts, one to ≤ 20 buckets; " +
      "alpha's scalar aggregate rides a broadcast.",
    Some("""WITH x AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
           |a AS (SELECT count(*) AS n,
           |        sum(CAST(round(ln(CAST(cnt AS DOUBLE) / 0.5), 9) AS DECIMAL(18,9))) AS slog
           |      FROM x),
           |b AS (SELECT length(bin(cnt)) - 1 AS bucket, count(*) AS n_parts,
           |        min(cnt) AS min_cnt, max(cnt) AS max_cnt
           |      FROM x GROUP BY 1)
           |SELECT CAST(b.bucket AS BIGINT) AS bucket,
           |       CAST(b.n_parts AS BIGINT) AS n_parts,
           |       CAST(b.min_cnt AS BIGINT) AS min_cnt,
           |       CAST(b.max_cnt AS BIGINT) AS max_cnt,
           |       round(CAST(b.n_parts AS DOUBLE) / a.n, 6) AS share,
           |       round(1 + a.n / CAST(a.slog AS DOUBLE), 6) AS alpha
           |FROM b, a ORDER BY bucket""".stripMargin),
    (s, d) => {
      val x = lineitem(s, d).groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      val a = x.agg(count(lit(1)).as("n"),
        sum(round(log(dbl(col("cnt")) / 0.5), 9).cast(DecimalType(18, 9)))
          .as("slog"))
      val b = x.groupBy((length(conv(col("cnt"), 10, 2)) - 1).as("bucket"))
        .agg(count(lit(1)).as("n_parts"), min("cnt").as("min_cnt"),
          max("cnt").as("max_cnt"))
      b.crossJoin(broadcast(a))
        .select(lng(col("bucket")).as("bucket"), lng(col("n_parts")).as("n_parts"),
          lng(col("min_cnt")).as("min_cnt"), lng(col("max_cnt")).as("max_cnt"),
          round(dbl(col("n_parts")) / col("n"), 6).as("share"),
          round(lit(1) + col("n") / dbl(col("slog")), 6).as("alpha"))
        .orderBy("bucket")
    }
  )

  // ------------------------------------------------------------- mutual info

  private val mutualInfo = QueryDef(
    "q_mutual_info",
    "Pointwise mutual information between event type and user cohort " +
      "(user_id mod 4): per cell, observed count, PMI = log2(c·N / " +
      "(R·C)) over exact BIGINTs, and the MI contribution p·PMI — the " +
      "dependence screen complementing q_chisq (which tests, this " +
      "quantifies). The total MI is the sum of contributions, left to " +
      "the consumer (q_chisq precedent: a float total's order is " +
      "engine-dependent; the per-cell table names the informative " +
      "cells). One fact aggregation to ≤ 20 cells; margins are tiny " +
      "broadcast joins.",
    Some("""WITH cells AS (SELECT event_type, user_id % 4 AS cohort, count(*) AS c
           |               FROM events GROUP BY 1, 2),
           |r AS (SELECT event_type, sum(c) AS r FROM cells GROUP BY 1),
           |k AS (SELECT cohort, sum(c) AS k FROM cells GROUP BY 1),
           |n AS (SELECT sum(c) AS n FROM cells)
           |SELECT cells.event_type, CAST(cells.cohort AS BIGINT) AS cohort,
           |       CAST(cells.c AS BIGINT) AS n_obs,
           |       round(log2(CAST(cells.c * n.n AS DOUBLE) / CAST(r.r * k.k AS DOUBLE)), 6) AS pmi,
           |       round((CAST(cells.c AS DOUBLE) / n.n)
           |             * log2(CAST(cells.c * n.n AS DOUBLE) / CAST(r.r * k.k AS DOUBLE)), 6) AS contrib
           |FROM cells JOIN r USING (event_type) JOIN k USING (cohort) CROSS JOIN n
           |ORDER BY event_type, cohort""".stripMargin),
    (s, d) => {
      val cells = events(s, d)
        .groupBy(col("event_type"), (col("user_id") % 4).as("cohort"))
        .agg(count(lit(1)).as("c"))
      val r = cells.groupBy("event_type").agg(sum("c").as("r"))
      val k = cells.groupBy("cohort").agg(sum("c").as("k"))
      val n = cells.agg(sum("c").as("n"))
      val pmi = log2(dbl(col("c") * col("n")) / dbl(col("r") * col("k")))
      cells.join(broadcast(r), "event_type").join(broadcast(k), "cohort")
        .crossJoin(broadcast(n))
        .select(col("event_type"), lng(col("cohort")).as("cohort"),
          lng(col("c")).as("n_obs"), round(pmi, 6).as("pmi"),
          round((dbl(col("c")) / col("n")) * pmi, 6).as("contrib"))
        .orderBy("event_type", "cohort")
    }
  )

  // ------------------------------------------------------------ graded ranking

  /** Graded retrieval evaluation — the metric battery a RAG / search
    * stack reports per release: NDCG@10, MRR@10 and hits@10 for the
    * cosine ranking, judged against graded label relevance (2 = same
    * label, 1 = adjacent label, 0 = else). The binary-relevance metrics
    * already in the inventory (q_auc, q_pr_curve, q_ann_recall) cannot
    * see ORDER quality among relevant results; NDCG's log-positional
    * discount is the standard fix (Järvelin & Kekäläinen 2002).
    *
    * Determinism: the only irrational per-rank factor, the discount
    * 1/log2(r+1), is computed once per rank value and rounded on the
    * 9-decimal grid into DECIMAL(18,9); gains are exact integers
    * (2^rel − 1 ∈ {0,1,3}), so DCG/IDCG accumulate as exact decimals
    * (order-free) and surface via the scaled-BIGINT idiom. Both row
    * orders (system = cosine desc, ideal = rel desc) tie-break on
    * cand_id.
    *
    * Scale: probe set broadcasts against a partition-parallel corpus
    * scan (the q_ann_cosine shape); both rankings come from ONE scored
    * frame via two windows partitioned by probe — no second corpus
    * pass for the ideal ranking. At 100 TB the rk window would ride
    * the TopKByScore partial aggregator (k rows per task per probe);
    * the metric arithmetic is unchanged.
    */
  private val ndcg = QueryDef(
    "q_ndcg",
    "Graded retrieval eval: NDCG@10 + MRR@10 + hits@10 of the cosine " +
      "ranking vs graded label relevance (2/1/0 by label distance) - " +
      "9-grid positional discounts, exact-decimal DCG accumulation, " +
      "ideal ranking from the same scored frame.",
    Some("""WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe, label AS plabel FROM embeddings WHERE vec_id < 20),
           |corpus AS (SELECT vec_id AS cand_id, embedding AS ce, label AS clabel FROM embeddings WHERE vec_id >= 20),
           |scored AS (
           |  SELECT probe_id, plabel, cand_id,
           |    round(list_sum(list_transform(list_zip(pe, ce), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
           |          (sqrt(list_sum(list_transform(pe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
           |           sqrt(list_sum(list_transform(ce, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim,
           |    greatest(0, 2 - abs(plabel - clabel)) AS rel
           |  FROM probes CROSS JOIN corpus),
           |g AS (SELECT *, CAST(CASE rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS BIGINT) AS gain FROM scored),
           |ranked AS (SELECT *,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY cos_sim DESC, cand_id) AS rk,
           |    row_number() OVER (PARTITION BY probe_id ORDER BY rel DESC, cand_id) AS rk2
           |  FROM g),
           |agg AS (
           |  SELECT probe_id, plabel,
           |    sum(CASE WHEN rk <= 10 THEN gain * CAST(round(1.0 / log2(CAST(rk AS DOUBLE) + 1), 9) AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9)) END) AS sdcg,
           |    sum(CASE WHEN rk2 <= 10 THEN gain * CAST(round(1.0 / log2(CAST(rk2 AS DOUBLE) + 1), 9) AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9)) END) AS sidcg,
           |    CAST(sum(CASE WHEN rk <= 10 AND rel >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits10,
           |    min(CASE WHEN rk <= 10 AND rel = 2 THEN rk END) AS first2
           |  FROM ranked WHERE rk <= 10 OR rk2 <= 10 GROUP BY 1, 2)
           |SELECT probe_id, CAST(plabel AS BIGINT) AS plabel, hits10,
           |       coalesce(round(1.0 / CAST(first2 AS DOUBLE), 6), 0.0) AS mrr10,
           |       round(CAST(CAST(sdcg * 1000000000 AS BIGINT) AS DOUBLE) / 1000000000, 9) AS dcg10,
           |       round(CAST(CAST(sidcg * 1000000000 AS BIGINT) AS DOUBLE) / 1000000000, 9) AS idcg10,
           |       round(CAST(CAST(sdcg * 1000000000 AS BIGINT) AS DOUBLE) /
           |             CAST(CAST(sidcg * 1000000000 AS BIGINT) AS DOUBLE), 6) AS ndcg10
           |FROM agg ORDER BY probe_id""".stripMargin),
    (s, d) => {
      val e = embeddings(s, d)
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
          col("label").as("plabel"))
      val corpus = e.filter(col("vec_id") >= 20)
        .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
          col("label").as("clabel"))
      val dec = DecimalType(18, 9)
      def disc(r: org.apache.spark.sql.Column) =
        round(lit(1.0) / log2(dbl(r) + 1), 9).cast(dec)
      val wSys = Window.partitionBy("probe_id").orderBy(col("cos_sim").desc, col("cand_id"))
      val wIdeal = Window.partitionBy("probe_id").orderBy(col("rel").desc, col("cand_id"))
      val ranked = corpus.join(broadcast(probes))
        .withColumn("cos_sim", round(cosine("pe", "ce"), 6))
        .withColumn("rel", greatest(lit(0), lit(2) - abs(col("plabel") - col("clabel"))))
        .withColumn("gain", expr("CAST(CASE rel WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS BIGINT)"))
        .withColumn("rk", row_number().over(wSys))
        .withColumn("rk2", row_number().over(wIdeal))
        .filter(col("rk") <= 10 || col("rk2") <= 10)
      ranked.groupBy("probe_id", "plabel")
        .agg(
          // gain rides as DECIMAL(2,0), not BIGINT: long×DECIMAL(18,9)
          // exceeds precision 38 and allowPrecisionLoss drops the scale
          // to 8 — silently off the 9-grid the oracle accumulates on
          sum(when(col("rk") <= 10, col("gain").cast(DecimalType(2, 0)) * disc(col("rk")))
            .otherwise(lit(0).cast(dec))).as("sdcg"),
          sum(when(col("rk2") <= 10, col("gain").cast(DecimalType(2, 0)) * disc(col("rk2")))
            .otherwise(lit(0).cast(dec))).as("sidcg"),
          lng(sum(when(col("rk") <= 10 && col("rel") >= 1, 1).otherwise(0))).as("hits10"),
          min(when(col("rk") <= 10 && col("rel") === 2, col("rk"))).as("first2"))
        .select(col("probe_id"), lng(col("plabel")).as("plabel"), col("hits10"),
          coalesce(round(lit(1.0) / dbl(col("first2")), 6), lit(0.0)).as("mrr10"),
          round(dbl(expr("CAST(sdcg * 1000000000 AS BIGINT)")) / lit(1000000000), 9).as("dcg10"),
          round(dbl(expr("CAST(sidcg * 1000000000 AS BIGINT)")) / lit(1000000000), 9).as("idcg10"),
          round(dbl(expr("CAST(sdcg * 1000000000 AS BIGINT)")) /
            dbl(expr("CAST(sidcg * 1000000000 AS BIGINT)")), 6).as("ndcg10"))
        .orderBy("probe_id")
    }
  )

  // ---------------------------------------------------------------- f1 macro

  private val f1Macro = QueryDef(
    "q_f1_macro",
    "Per-class precision/recall/F1 plus the macro row (label = -1) for " +
      "the nearest-centroid classifier — the per-release metric " +
      "battery a confusion matrix (q_centroid_confusion) feeds: macro " +
      "averaging weights every class equally, which is what matters " +
      "under the imbalance q_class_weights measures. All three " +
      "metrics are SINGLE divisions of exact BIGINT counts (F1 via " +
      "the rational identity 2tp/(2tp+fp+fn) — never the 2pr/(p+r) " +
      "chain, whose two intermediate roundings diverge across " +
      "engines); the macro row averages the round-6 per-class values " +
      "through exact DECIMAL accumulation (q_xentropy discipline). " +
      "Shape: everything derives from the ≤ K² confusion-matrix " +
      "aggregate of the shared centroid-distance fold — the fact is " +
      "touched once; the metric table is K+1 rows.",
    Some(s"""WITH cent AS ($CentroidSql),
            |el AS (SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS dim,
            |              unnest(embedding) AS v
            |       FROM embeddings),
            |dist AS (SELECT el.vec_id, el.label AS true_label, cent.clabel,
            |           sum($DistTermSql) AS d2
            |         FROM el JOIN cent USING (dim) GROUP BY 1, 2, 3),
            |pred AS (SELECT vec_id, true_label, clabel,
            |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
            |         FROM dist),
            |cm AS (SELECT true_label AS t, clabel AS p, count(*) AS n
            |       FROM pred WHERE rn = 1 GROUP BY 1, 2),
            |lbl AS (SELECT t AS label, sum(n) AS truetot FROM cm GROUP BY 1),
            |ptot AS (SELECT p AS label, sum(n) AS predtot FROM cm GROUP BY 1),
            |diag AS (SELECT t AS label, n FROM cm WHERE t = p),
            |per AS (SELECT lbl.label, coalesce(diag.n, 0) AS tp,
            |          coalesce(ptot.predtot, 0) - coalesce(diag.n, 0) AS fp,
            |          lbl.truetot - coalesce(diag.n, 0) AS fn
            |        FROM lbl LEFT JOIN ptot USING (label) LEFT JOIN diag USING (label)),
            |m AS (SELECT label, tp, fp, fn,
            |        CASE WHEN tp + fp = 0 THEN 0.0
            |             ELSE round(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS prec,
            |        round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS rec,
            |        round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) AS f1
            |      FROM per)
            |SELECT CAST(label AS BIGINT) AS label, CAST(tp AS BIGINT) AS tp,
            |       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn, prec, rec, f1
            |FROM m
            |UNION ALL
            |SELECT -1, CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
            |       CAST(sum(fn) AS BIGINT),
            |       round(CAST(sum(CAST(prec AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6),
            |       round(CAST(sum(CAST(rec AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6),
            |       round(CAST(sum(CAST(f1 AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
            |FROM m
            |ORDER BY label""".stripMargin),
    (s, d) => {
      val dist = centroidDistances(s, d)
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
      val cm = dist.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("true_label").as("t"), col("clabel").as("p"))
        .agg(count(lit(1)).as("n"))
        // K² rows at most — every downstream pivot is driver-trivial but
        // stays declarative; persist so the three re-aggregations below
        // don't re-run the centroid fold
        .persist()
      val lbl = cm.groupBy(col("t").as("label")).agg(sum("n").as("truetot"))
      val ptot = cm.groupBy(col("p").as("label")).agg(sum("n").as("predtot"))
      val diag = cm.filter(col("t") === col("p"))
        .select(col("t").as("label"), col("n"))
      val per = lbl.join(ptot, Seq("label"), "left")
        .join(diag, Seq("label"), "left")
        .select(col("label"),
          coalesce(col("n"), lit(0L)).as("tp"),
          (coalesce(col("predtot"), lit(0L)) - coalesce(col("n"), lit(0L))).as("fp"),
          (col("truetot") - coalesce(col("n"), lit(0L))).as("fn"))
      val m = per.select(col("label"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(round(dbl(col("tp")) / (col("tp") + col("fp")), 6)).as("prec"),
        round(dbl(col("tp")) / (col("tp") + col("fn")), 6).as("rec"),
        round(dbl(lit(2) * col("tp")) / (lit(2) * col("tp") + col("fp") + col("fn")), 6)
          .as("f1"))
        .persist()
      val dec6 = DecimalType(18, 6)
      val macroRow = m.agg(
        lng(sum("tp")).as("tp"), lng(sum("fp")).as("fp"), lng(sum("fn")).as("fn"),
        round(dbl(sum(col("prec").cast(dec6))) / count(lit(1)), 6).as("prec"),
        round(dbl(sum(col("rec").cast(dec6))) / count(lit(1)), 6).as("rec"),
        round(dbl(sum(col("f1").cast(dec6))) / count(lit(1)), 6).as("f1"))
        .select(lit(-1L).as("label"), col("tp"), col("fp"), col("fn"),
          col("prec"), col("rec"), col("f1"))
      m.select(lng(col("label")).as("label"), lng(col("tp")).as("tp"),
          lng(col("fp")).as("fp"), lng(col("fn")).as("fn"),
          col("prec"), col("rec"), col("f1"))
        .unionByName(macroRow)
        .orderBy("label")
    }
  )

  /** Chance-corrected agreement metrics over the nearest-centroid
    * confusion matrix: Cohen's kappa and the multiclass Matthews
    * correlation coefficient (the R_K statistic, Gorodkin 2004) — the
    * two single-number summaries that stay honest under the class
    * imbalance q_class_weights measures (accuracy and even macro-F1
    * reward majority-class collapse; kappa/MCC go to 0 for it).
    *
    * Determinism: every input is an exact BIGINT count from the shared
    * integer-exact centroid fold; kappa and MCC are then ONE double
    * expression each over those exact ints (products ≤ ~6e10 « 2^53,
    * so the int→double conversions are exact; sqrt is correctly
    * rounded IEEE in both engines), rounded once to 6 decimals.
    *
    * Shape: derives entirely from the ≤ K² confusion-matrix aggregate
    * — the corpus is touched once by the centroid fold; the marginal
    * sums and the final scalar row are broadcast-trivial.
    */
  private val mccKappa = QueryDef(
    "q_mcc_kappa",
    "Cohen's kappa + multiclass Matthews correlation (R_K) for the " +
      "nearest-centroid classifier, computed from exact BIGINT " +
      "confusion-matrix marginals: kappa = (c·s − Σ t_k·p_k) / " +
      "(s² − Σ t_k·p_k), MCC = (c·s − Σ t_k·p_k) / " +
      "√((s² − Σ p_k²)(s² − Σ t_k²)) — each ONE rounded double " +
      "expression over exact integers.",
    Some(s"""WITH cent AS ($CentroidSql),
            |el AS (SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS dim,
            |              unnest(embedding) AS v
            |       FROM embeddings),
            |dist AS (SELECT el.vec_id, el.label AS true_label, cent.clabel,
            |           sum($DistTermSql) AS d2
            |         FROM el JOIN cent USING (dim) GROUP BY 1, 2, 3),
            |pred AS (SELECT vec_id, true_label, clabel,
            |           row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
            |         FROM dist),
            |cm AS (SELECT true_label AS t, clabel AS p, count(*) AS n
            |       FROM pred WHERE rn = 1 GROUP BY 1, 2),
            |lbl AS (SELECT t AS label, sum(n) AS tk FROM cm GROUP BY 1),
            |ptot AS (SELECT p AS label, sum(n) AS pk FROM cm GROUP BY 1),
            |sc AS (SELECT CAST(sum(n) AS BIGINT) AS s,
            |              CAST(sum(CASE WHEN t = p THEN n ELSE 0 END) AS BIGINT) AS c
            |       FROM cm),
            |marg AS (SELECT
            |           (SELECT CAST(sum(lbl.tk * coalesce(ptot.pk, 0)) AS BIGINT)
            |            FROM lbl LEFT JOIN ptot USING (label)) AS tp_dot,
            |           (SELECT CAST(sum(pk * pk) AS BIGINT) FROM ptot) AS p2,
            |           (SELECT CAST(sum(tk * tk) AS BIGINT) FROM lbl) AS t2)
            |SELECT s AS n, c AS n_correct,
            |       round(CAST(c AS DOUBLE) / s, 6) AS accuracy,
            |       round(CAST(c * s - tp_dot AS DOUBLE) / nullif(s * s - tp_dot, 0), 6) AS kappa,
            |       round(CAST(c * s - tp_dot AS DOUBLE)
            |             / nullif(sqrt(CAST(s * s - p2 AS DOUBLE) * CAST(s * s - t2 AS DOUBLE)), 0), 6) AS mcc
            |FROM sc CROSS JOIN marg""".stripMargin),
    (s, d) => {
      val dist = centroidDistances(s, d)
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
      val cm = dist.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("true_label").as("t"), col("clabel").as("p"))
        .agg(count(lit(1)).as("n"))
        // ≤ K² rows; persist so the marginal re-aggregations below do
        // not re-run the centroid fold (q_f1_macro discipline)
        .persist()
      val lbl = cm.groupBy(col("t").as("label")).agg(sum("n").as("tk"))
      val ptot = cm.groupBy(col("p").as("label")).agg(sum("n").as("pk"))
      val sc = cm.agg(lng(sum("n")).as("s"),
        lng(sum(when(col("t") === col("p"), col("n")).otherwise(0L))).as("c"))
      // marginal sums computed from EACH side alone (t2 from lbl, p2
      // from ptot) — an inner join would drop never-predicted classes
      // from Σt_k² and understate the R_K denominator (review r10);
      // tp_dot tolerates the left join since a missing side is a 0 term
      val tpDot = lbl.join(ptot, Seq("label"), "left")
        .agg(lng(sum(col("tk") * coalesce(col("pk"), lit(0L)))).as("tp_dot"))
      val marg = tpDot
        .crossJoin(broadcast(ptot.agg(lng(sum(col("pk") * col("pk"))).as("p2"))))
        .crossJoin(broadcast(lbl.agg(lng(sum(col("tk") * col("tk"))).as("t2"))))
      sc.crossJoin(broadcast(marg))
        .select(col("s").as("n"), col("c").as("n_correct"),
          round(dbl(col("c")) / col("s"), 6).as("accuracy"),
          // nullif on both denominators: single-class collapse makes
          // s^2 = tp_dot (kappa) or p2/t2 = s^2 (MCC sqrt) exactly 0,
          // where Spark NULL and DuckDB inf diverge (ADVICE r10); the
          // guarded form yields NULL identically in both engines
          round(dbl(col("c") * col("s") - col("tp_dot"))
            / nullif(col("s") * col("s") - col("tp_dot"), lit(0L)), 6).as("kappa"),
          round(dbl(col("c") * col("s") - col("tp_dot"))
            / nullif(sqrt(dbl(col("s") * col("s") - col("p2"))
              * dbl(col("s") * col("s") - col("t2"))), lit(0.0)), 6).as("mcc"))
    }
  )

  /** Weight-of-evidence / information-value feature screening — the
    * supervised binning readout (credit-scoring heritage, now the
    * standard tabular feature screen): does the `value` feature
    * separate purchase events from the rest, and which bins carry the
    * signal? Ten equal-width bins over the observed range; per bin
    * the Laplace-smoothed WoE = ln(((good+1)·(B+10)) / ((bad+1)·
    * (G+10))) and its IV term (good share − bad share)·WoE. Smoothing
    * keeps every bin defined (an empty-side bin would hit ln 0), the
    * standard practice.
    *
    * Determinism: bin assignment is one shared IEEE expression over
    * the exact min/max (clamped to bin 9 at v = max); counts are
    * exact BIGINTs; the smoothed WoE argument is a ratio of exact
    * integer products (< 2^53, so the int→double conversions are
    * exact) with ONE division and ONE ln, rounded once; the IV term
    * multiplies two round-9 values and rounds once more (the
    * colloc_lift discipline).
    *
    * Scale: one fact aggregation to ≤ 10×2 cells after a broadcast
    * min/max; everything downstream is bins-sized.
    */
  private val infoValue = QueryDef(
    "q_info_value",
    "Weight-of-evidence feature screen: 10 equal-width value bins vs " +
      "the purchase label, per bin the exact counts, Laplace-smoothed " +
      "WoE and IV term — the supervised binning readout run before " +
      "shipping a tabular feature.",
    Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |e AS (SELECT CASE WHEN hi = lo THEN 0
           |             ELSE least(9, CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT)) END AS bin,
           |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
           |      FROM events CROSS JOIN b),
           |cells AS (SELECT bin, sum(good) AS g, sum(1 - good) AS bad
           |          FROM e GROUP BY 1),
           |tot AS (SELECT sum(g) AS gt, sum(bad) AS bt FROM cells)
           |SELECT CAST(bin AS BIGINT) AS bin,
           |       CAST(g + bad AS BIGINT) AS n,
           |       CAST(g AS BIGINT) AS n_good,
           |       CAST(bad AS BIGINT) AS n_bad,
           |       round(ln(CAST((g + 1) * (bt + 10) AS DOUBLE)
           |                / ((bad + 1) * (gt + 10))), 9) AS woe,
           |       round((CAST(g AS DOUBLE) / nullif(gt, 0) - CAST(bad AS DOUBLE) / nullif(bt, 0))
           |             * round(ln(CAST((g + 1) * (bt + 10) AS DOUBLE)
           |                        / ((bad + 1) * (gt + 10))), 9), 9) AS iv_term
           |FROM cells CROSS JOIN tot ORDER BY bin""".stripMargin),
    (s, d) => {
      val ev = events(s, d).select(col("value"), col("event_type"))
      val b = ev.agg(min("value").as("lo"), max("value").as("hi"))
      val e = ev.crossJoin(broadcast(b))
        .select(when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(lit(9), floor((col("value") - col("lo"))
              / (col("hi") - col("lo")) * 10).cast("long"))).as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("good"))
      val cells = e.groupBy("bin")
        .agg(sum("good").as("g"), sum(lit(1L) - col("good")).as("bad"))
      val tot = cells.agg(sum("g").as("gt"), sum("bad").as("bt"))
      val woe = round(log(dbl((col("g") + 1) * (col("bt") + 10))
        / ((col("bad") + 1) * (col("gt") + 10))), 9)
      cells.crossJoin(broadcast(tot))
        .select(lng(col("bin")).as("bin"),
          lng(col("g") + col("bad")).as("n"),
          lng(col("g")).as("n_good"), lng(col("bad")).as("n_bad"),
          woe.as("woe"),
          // hi==lo -> everything in bin 0, and nullif on the class
          // totals: a class-empty corpus gives gt/bt = 0 where Spark
          // NULL and DuckDB inf diverge (ADVICE r10)
          round((dbl(col("g")) / nullif(col("gt"), lit(0L))
            - dbl(col("bad")) / nullif(col("bt"), lit(0L)))
            * woe, 9).as("iv_term"))
        .orderBy("bin")
    }
  )

  /** One decision-stump training step — the classic weak learner
    * (every boosting round trains one): over the nine equal-width
    * value thresholds, pick the split maximizing information gain on
    * the purchase label. The train-side sibling of [[infoValue]]
    * (which reads the bins out; this SELECTS a model from them) and
    * the tabular entry in the one-training-step family (q_kmeans,
    * q_mf_step, q_als_solve).
    *
    * Determinism: candidate thresholds are exact bin edges from the
    * broadcast min/max; all split counts are exact BIGINTs; each
    * entropy is the q_entropy ln-grid discipline (per-side −p·log2 p
    * rounded to 9 decimals, summed as DECIMAL) and the gain is a
    * single rounded subtraction chain, so the argmax compares
    * identical grid values in both engines, ties to the lower
    * threshold index.
    *
    * Scale: ONE map-side-combined fact aggregation to ≤ 10×2 cells;
    * every candidate split's counts are cumulative sums over that
    * bins-sized table (the fact is never re-scanned per threshold —
    * the naive per-threshold pass would read the data 9 times).
    */
  private val stump = QueryDef(
    "q_stump",
    "Decision-stump training on the purchase label: information gain " +
      "of each equal-width value threshold computed from cumulative " +
      "sums over ONE binned fact aggregation, ln-grid entropies, " +
      "argmax split with lower-threshold tie-break; emits every " +
      "candidate with its gain and the chosen flag.",
    Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |e AS (SELECT CASE WHEN hi = lo THEN 0
           |             ELSE least(9, CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT)) END AS bin,
           |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
           |      FROM events CROSS JOIN b),
           |cells AS (SELECT bin, sum(good) AS g, sum(1 - good) AS bad
           |          FROM e GROUP BY 1),
           |cum AS (SELECT bin, sum(g) OVER (ORDER BY bin) AS cg,
           |               sum(bad) OVER (ORDER BY bin) AS cb
           |        FROM cells),
           |tot AS (SELECT sum(g) AS gt, sum(bad) AS bt FROM cells),
           |cand AS (SELECT cum.bin AS thr, cum.cg AS lg, cum.cb AS lb,
           |                tot.gt - cum.cg AS rg, tot.bt - cum.cb AS rb,
           |                tot.gt AS gt, tot.bt AS bt
           |         FROM cum CROSS JOIN tot WHERE cum.bin < 9),
           |ent AS (SELECT thr, lg, lb, rg, rb,
           |          round(CASE WHEN gt = 0 OR bt = 0 THEN 0
           |            ELSE -(CAST(gt AS DOUBLE)/(gt+bt))*log2(CAST(gt AS DOUBLE)/(gt+bt))
           |                 -(CAST(bt AS DOUBLE)/(gt+bt))*log2(CAST(bt AS DOUBLE)/(gt+bt)) END, 9) AS hp,
           |          round(CASE WHEN lg = 0 OR lb = 0 OR lg + lb = 0 THEN 0
           |            ELSE -(CAST(lg AS DOUBLE)/(lg+lb))*log2(CAST(lg AS DOUBLE)/(lg+lb))
           |                 -(CAST(lb AS DOUBLE)/(lg+lb))*log2(CAST(lb AS DOUBLE)/(lg+lb)) END, 9) AS hl,
           |          round(CASE WHEN rg = 0 OR rb = 0 OR rg + rb = 0 THEN 0
           |            ELSE -(CAST(rg AS DOUBLE)/(rg+rb))*log2(CAST(rg AS DOUBLE)/(rg+rb))
           |                 -(CAST(rb AS DOUBLE)/(rg+rb))*log2(CAST(rb AS DOUBLE)/(rg+rb)) END, 9) AS hr,
           |          gt + bt AS n
           |        FROM cand),
           |gain AS (SELECT thr, lg, lb, rg, rb,
           |           round(hp - (CAST(lg+lb AS DOUBLE) * hl + CAST(rg+rb AS DOUBLE) * hr) / n, 9) AS ig
           |         FROM ent),
           |best AS (SELECT min(thr) AS bthr FROM gain
           |         WHERE ig = (SELECT max(ig) FROM gain))
           |SELECT CAST(thr AS BIGINT) AS thr,
           |       CAST(lg AS BIGINT) AS left_good, CAST(lb AS BIGINT) AS left_bad,
           |       CAST(rg AS BIGINT) AS right_good, CAST(rb AS BIGINT) AS right_bad,
           |       ig, (thr = best.bthr) AS chosen
           |FROM gain CROSS JOIN best ORDER BY thr""".stripMargin),
    (s, d) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val ev = events(s, d).select(col("value"), col("event_type"))
      val b = ev.agg(min("value").as("lo"), max("value").as("hi"))
      val cells = ev.crossJoin(broadcast(b))
        .select(when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(lit(9), floor((col("value") - col("lo"))
              / (col("hi") - col("lo")) * 10).cast("long"))).as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("good"))
        .groupBy("bin")
        .agg(sum("good").as("g"), sum(lit(1L) - col("good")).as("bad"))
        .persist()
      // cumulative split counts over the ≤10-row binned table; the
      // single-partition window is bounded by the bin count, same
      // class as the kcore degree-histogram cumsum — but keep it
      // partitioned anyway via a constant-free trick: bins ≤ 10 rows
      // ride ONE broadcastable frame, so compute cumsums driver-free
      // with a self-join (no Window node — PlanSpec gate)
      val cum = cells.as("a").join(cells.as("b"), col("b.bin") <= col("a.bin"))
        .groupBy(col("a.bin").as("thr"))
        .agg(sum(col("b.g")).as("lg"), sum(col("b.bad")).as("lb"))
      val tot = cells.agg(sum("g").as("gt"), sum("bad").as("bt"))
      val cand = cum.crossJoin(broadcast(tot)).filter(col("thr") < 9)
        .select(col("thr"), col("lg"), col("lb"),
          (col("gt") - col("lg")).as("rg"), (col("bt") - col("lb")).as("rb"),
          col("gt"), col("bt"))
      def h2(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = {
        val n = x + y
        round(when(x === 0 || y === 0 || n === 0, 0.0)
          .otherwise(-(dbl(x) / n) * log2(dbl(x) / n)
            - (dbl(y) / n) * log2(dbl(y) / n)), 9)
      }
      val gain = cand.select(col("thr"), col("lg"), col("lb"), col("rg"), col("rb"),
          round(h2(col("gt"), col("bt"))
            - (dbl(col("lg") + col("lb")) * h2(col("lg"), col("lb"))
              + dbl(col("rg") + col("rb")) * h2(col("rg"), col("rb")))
              / (col("gt") + col("bt")), 9).as("ig"))
        .persist()
      val best = gain.orderBy(col("ig").desc, col("thr")).limit(1)
        .select(col("thr").as("bthr"))
      gain.crossJoin(broadcast(best))
        .select(lng(col("thr")).as("thr"),
          lng(col("lg")).as("left_good"), lng(col("lb")).as("left_bad"),
          lng(col("rg")).as("right_good"), lng(col("rb")).as("right_bad"),
          col("ig"), (col("thr") === col("bthr")).as("chosen"))
        .orderBy("thr")
    }
  )

  /** One logistic-regression gradient step — the linear member of the
    * one-training-step family (q_stump = tree, q_kmeans = clusters,
    * q_mf_step/q_als_solve = factors; VERDICT r10 #5): the
    * quality-classifier shape (fasttext-style) every curation stack
    * trains over document features. Model p(purchase | value) =
    * σ(w0 + w1·(value / vmax)); one full-batch step from w = 0 with
    * η = 1/2.
    *
    * Determinism: at w = 0, σ(z) = 1/2 EXACTLY, so the gradient
    * numerators are exact — Σ(1/2 − y) is a BIGINT affair and
    * Σ(1/2 − y)·value sums exact DECIMAL(19,3) (±0.5 × a 2-decimal
    * value; the vmax normalizer factors out of the sum). Each new
    * weight is then ONE double expression over those exact aggregates,
    * rounded to the 9-decimal grid. The after-step loss feeds each
    * row's z through the identical IEEE chain (two products, one
    * division by the exact vmax), rounds the ln(1+exp(z)) − y·z term
    * to the 9-grid per row and sums as exact DECIMAL — the ln-grid
    * discipline, so no float accumulation order exists. Before-step
    * loss is the closed form ln 2. Guards: nullif(vmax) for an
    * all-zero feature; n = 0 cannot reach the division (no rows → no
    * output).
    *
    * Scale: two passes over the fact (one 4-aggregate rollup, one
    * broadcast-weight scoring pass reduced map-side) — no shuffle
    * wider than a single row; the model is 2 numbers.
    */
  private val logregStep = QueryDef(
    "q_logreg_step",
    "One full-batch logistic-regression gradient step (eta = 1/2, " +
      "w = 0 start, max-normalized value feature) on the purchase " +
      "label: exact-decimal gradient numerators, 9-grid weights, and " +
      "the mean log-loss before (closed-form ln 2) and after the step " +
      "via per-row ln-grid terms — loss must not increase.",
    Some("""WITH s AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n,
           |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np,
           |         sum(CAST(CASE WHEN event_type = 'purchase' THEN -0.5 ELSE 0.5 END AS DECIMAL(2,1))
           |             * CAST(value AS DECIMAL(18,2))) AS s1,
           |         CAST(max(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS vmax
           |  FROM events),
           |w AS (SELECT n, np, vmax,
           |        round(-0.5 * (0.5 - CAST(np AS DOUBLE) / n), 9) AS w0,
           |        round(-0.5 * (CAST(s1 AS DOUBLE) / n / nullif(vmax, 0)), 9) AS w1
           |      FROM s),
           |l AS (SELECT round(ln(1 + exp(w.w0 + w.w1 * (CAST(value AS DOUBLE) / w.vmax)))
           |               - (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |                 * (w.w0 + w.w1 * (CAST(value AS DOUBLE) / w.vmax)), 9) AS t
           |      FROM events CROSS JOIN w)
           |SELECT w.n, w.np, w.w0, w.w1,
           |       round(ln(2), 9) AS loss_before,
           |       round(CAST(sum(CAST(t AS DECIMAL(28,9))) AS DOUBLE) / w.n, 6) AS loss_after
           |FROM l CROSS JOIN w
           |GROUP BY w.n, w.np, w.w0, w.w1""".stripMargin),
    (s, d) => {
      val ev = events(s, d).select(col("value"), col("event_type"))
      val half = when(col("event_type") === "purchase",
        lit(BigDecimal("-0.5")).cast("decimal(2,1)"))
        .otherwise(lit(BigDecimal("0.5")).cast("decimal(2,1)"))
      val agg = ev.agg(lng(count(lit(1))).as("n"),
        lng(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))).as("np"),
        sum(half * money(col("value"))).as("s1"),
        dbl(max(money(col("value")))).as("vmax"))
      val w = agg.select(col("n"), col("np"), col("vmax"),
        round(lit(-0.5) * (lit(0.5) - dbl(col("np")) / col("n")), 9).as("w0"),
        round(lit(-0.5) * (dbl(col("s1")) / col("n")
          / nullif(col("vmax"), lit(0.0))), 9).as("w1"))
      val z = col("w0") + col("w1") * (dbl(col("value")) / col("vmax"))
      val y = when(col("event_type") === "purchase", 1).otherwise(0)
      ev.crossJoin(broadcast(w))
        .select(col("n"), col("np"), col("w0"), col("w1"),
          round(log(lit(1) + exp(z)) - y * z, 9).as("t"))
        .groupBy("n", "np", "w0", "w1")
        .agg(round(dbl(sum(col("t").cast("decimal(28,9)"))) / col("n"), 6)
          .as("loss_after"))
        .select(col("n"), col("np"), col("w0"), col("w1"),
          round(lit(math.log(2)), 9).as("loss_before"), col("loss_after"))
    }
  )

  /** One AdaBoost round — the ENSEMBLE step over the weak learner the
    * inventory already trains (q_stump): train stump 1 by exact
    * misclassification count, compute its vote weight
    * alpha = ½·ln((1−err)/err), reweight every sample by whether
    * stump 1 got it right (e^∓alpha), and train stump 2 on the
    * REWEIGHTED distribution — the second boosting iteration's model.
    * Completes the training-step family vertically: the other keys
    * each take one step of one model; this one composes two.
    *
    * Determinism: stump-1 errors are exact BIGINTs (leaf = unweighted
    * majority, ties predict the negative class; argmin ties to the
    * lower threshold); alpha is ONE round-9 double expression over
    * exact counts; the two sample weights are round-9 exp values; the
    * reweighted cell masses round to the 6-grid per cell (counts reach
    * 1e5, so a 9-grid value would exceed double's exact 15-digit
    * range) and sum as
    * exact DECIMAL, so stump-2's weighted-error comparisons are exact
    * decimal compares in both engines — no float accumulation order
    * anywhere. Guard: a perfect (or perfectly wrong) stump pins
    * alpha = 0 instead of ±inf.
    *
    * Scale: ONE map-side-combined binned fact aggregation (the
    * q_stump shape); everything downstream is bins-sized frames
    * threaded through broadcast crossJoins — the boosting round adds
    * zero passes over the fact.
    */
  private val adaboostRound = QueryDef(
    "q_adaboost_round",
    "One AdaBoost round over decision stumps on the purchase label: " +
      "stump 1 by exact misclassification count, vote weight alpha = " +
      "0.5*ln((1-err)/err), e^(+-alpha) sample reweighting, stump 2 " +
      "trained on the reweighted 6-grid decimal masses - one row with " +
      "n, thr1, err1, alpha, thr2, weighted err2.",
    Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |e AS (SELECT CASE WHEN hi = lo THEN 0
           |             ELSE least(9, CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT)) END AS bin,
           |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS good
           |      FROM events CROSS JOIN b),
           |cells AS (SELECT bin, sum(good) AS g, sum(1 - good) AS bad
           |          FROM e GROUP BY 1),
           |tot AS (SELECT sum(g) AS gt, sum(bad) AS bt FROM cells),
           |cum AS (SELECT a.bin AS thr, sum(c.g) AS lg, sum(c.bad) AS lb
           |        FROM cells a JOIN cells c ON c.bin <= a.bin GROUP BY 1),
           |cand AS (SELECT thr, lg, lb, gt - lg AS rg, bt - lb AS rb, gt, bt
           |         FROM cum CROSS JOIN tot WHERE thr < 9),
           |e1 AS (SELECT *,
           |         (CASE WHEN lg > lb THEN lb ELSE lg END)
           |         + (CASE WHEN rg > rb THEN rb ELSE rg END) AS err FROM cand),
           |best1 AS (SELECT thr AS thr1, err AS err1, lg > lb AS predl,
           |                 rg > rb AS predr, gt + bt AS n
           |          FROM e1 ORDER BY err, thr LIMIT 1),
           |w1 AS (SELECT *,
           |         CASE WHEN err1 = 0 OR err1 = n THEN 0.0
           |              ELSE round(0.5 * ln(CAST(n - err1 AS DOUBLE) / err1), 9) END AS alpha
           |       FROM best1),
           |w2 AS (SELECT *, round(exp(-alpha), 9) AS w_right,
           |               round(exp(alpha), 9) AS w_wrong FROM w1),
           |wcells AS (SELECT c.bin,
           |    CAST(round(c.g * CASE WHEN (CASE WHEN c.bin <= w2.thr1 THEN w2.predl ELSE w2.predr END)
           |                          THEN w2.w_right ELSE w2.w_wrong END, 6) AS DECIMAL(28,6)) AS wg,
           |    CAST(round(c.bad * CASE WHEN NOT (CASE WHEN c.bin <= w2.thr1 THEN w2.predl ELSE w2.predr END)
           |                           THEN w2.w_right ELSE w2.w_wrong END, 6) AS DECIMAL(28,6)) AS wb
           |  FROM cells c CROSS JOIN w2),
           |wcum AS (SELECT a.bin AS thr, sum(c.wg) AS wlg, sum(c.wb) AS wlb
           |         FROM wcells a JOIN wcells c ON c.bin <= a.bin GROUP BY 1),
           |wtot AS (SELECT sum(wg) AS wgt, sum(wb) AS wbt FROM wcells),
           |wcand AS (SELECT thr, wlg, wlb, wgt - wlg AS wrg, wbt - wlb AS wrb
           |          FROM wcum CROSS JOIN wtot WHERE thr < 9),
           |e2 AS (SELECT thr,
           |         (CASE WHEN wlg > wlb THEN wlb ELSE wlg END)
           |         + (CASE WHEN wrg > wrb THEN wrb ELSE wrg END) AS werr FROM wcand),
           |best2 AS (SELECT thr AS thr2, werr FROM e2 ORDER BY werr, thr LIMIT 1)
           |SELECT CAST(w2.n AS BIGINT) AS n, CAST(w2.thr1 AS BIGINT) AS thr1,
           |       CAST(w2.err1 AS BIGINT) AS err1, w2.alpha,
           |       CAST(best2.thr2 AS BIGINT) AS thr2,
           |       CAST(best2.werr AS DOUBLE) AS werr2
           |FROM w2 CROSS JOIN best2""".stripMargin),
    (s, d) => {
      val ev = events(s, d).select(col("value"), col("event_type"))
      val b = ev.agg(min("value").as("lo"), max("value").as("hi"))
      val cells = ev.crossJoin(broadcast(b))
        .select(when(col("hi") === col("lo"), lit(0L))
            .otherwise(least(lit(9), floor((col("value") - col("lo"))
              / (col("hi") - col("lo")) * 10).cast("long"))).as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("good"))
        .groupBy("bin")
        .agg(sum("good").as("g"), sum(lit(1L) - col("good")).as("bad"))
        .persist()
      val tot = cells.agg(sum("g").as("gt"), sum("bad").as("bt"))
      // bins-sized cumulative counts via bounded self-join (PlanSpec
      // no-unpartitioned-Window gate; the q_stump trick)
      val cum = cells.as("a").join(cells.as("c"), col("c.bin") <= col("a.bin"))
        .groupBy(col("a.bin").as("thr"))
        .agg(sum(col("c.g")).as("lg"), sum(col("c.bad")).as("lb"))
      val cand = cum.crossJoin(broadcast(tot)).filter(col("thr") < 9)
        .select(col("thr"), col("lg"), col("lb"),
          (col("gt") - col("lg")).as("rg"), (col("bt") - col("lb")).as("rb"),
          col("gt"), col("bt"))
        .withColumn("err",
          when(col("lg") > col("lb"), col("lb")).otherwise(col("lg"))
            + when(col("rg") > col("rb"), col("rb")).otherwise(col("rg")))
      val best1 = cand.orderBy(col("err"), col("thr")).limit(1)
        .select(col("thr").as("thr1"), col("err").as("err1"),
          (col("lg") > col("lb")).as("predl"), (col("rg") > col("rb")).as("predr"),
          (col("gt") + col("bt")).as("n"))
        .withColumn("alpha",
          when(col("err1") === 0 || col("err1") === col("n"), lit(0.0))
            .otherwise(round(lit(0.5)
              * log(dbl(col("n") - col("err1")) / col("err1")), 9)))
        .withColumn("w_right", round(exp(-col("alpha")), 9))
        .withColumn("w_wrong", round(exp(col("alpha")), 9))
      val wcells = cells.crossJoin(broadcast(best1))
        .withColumn("p", when(col("bin") <= col("thr1"), col("predl"))
          .otherwise(col("predr")))
        .select(col("bin"),
          // 6-decimal mass grid, NOT 9: counts reach 1e5, and a
          // 9-decimal value at that magnitude needs 15 significant
          // digits - beyond double's exact grid, so the round->cast
          // chain re-rounds differently per engine (caught by the
          // oracle); 6+6 digits sits safely inside the 53-bit mantissa
          round(col("g") * when(col("p"), col("w_right")).otherwise(col("w_wrong")), 6)
            .cast("decimal(28,6)").as("wg"),
          round(col("bad") * when(!col("p"), col("w_right")).otherwise(col("w_wrong")), 6)
            .cast("decimal(28,6)").as("wb"))
        .persist()
      val wtot = wcells.agg(sum("wg").as("wgt"), sum("wb").as("wbt"))
      val wcum = wcells.as("a").join(wcells.as("c"), col("c.bin") <= col("a.bin"))
        .groupBy(col("a.bin").as("thr"))
        .agg(sum(col("c.wg")).as("wlg"), sum(col("c.wb")).as("wlb"))
      val best2 = wcum.crossJoin(broadcast(wtot)).filter(col("thr") < 9)
        .select(col("thr"), col("wlg"), col("wlb"),
          (col("wgt") - col("wlg")).as("wrg"), (col("wbt") - col("wlb")).as("wrb"))
        .withColumn("werr",
          when(col("wlg") > col("wlb"), col("wlb")).otherwise(col("wlg"))
            + when(col("wrg") > col("wrb"), col("wrb")).otherwise(col("wrg")))
        .orderBy(col("werr"), col("thr")).limit(1)
        .select(col("thr").as("thr2"), dbl(col("werr")).as("werr2"))
      materializeThenRelease(
        best1.select(lng(col("n")).as("n"), lng(col("thr1")).as("thr1"),
            lng(col("err1")).as("err1"), col("alpha"))
          .crossJoin(broadcast(best2)),
        cells, wcells)
    }
  )

  /** Multinomial naive Bayes over the document corpus — the GENERATIVE
    * member of the classifier family (q_knn_classify = instance-based,
    * q_stump = tree, q_logreg_step = linear): Laplace-smoothed
    * per-language word likelihoods trained on the doc_id%5≠0 split,
    * test docs (doc_id%5=0) classified by argmax posterior. This is
    * the classic fasttext-free language/quality filter shape: train
    * and apply are both pure count aggregations, so the "model" is a
    * table, not an artifact.
    *
    * Determinism: every likelihood is one shared ln chain over exact
    * BIGINT counts, rounded to the 9-grid and cast DECIMAL(18,9); a
    * document's score accumulates k·lp as exact decimal products
    * (k = occurrence count), so the argmax compares exact decimals —
    * no float accumulation order. Ties break to the lexicographically
    * first language. Docs whose text has no [a-z]+ token are excluded
    * by construction in BOTH engines (they never enter the exploded
    * stream).
    *
    * Scale: the corpus is tokenized ONCE (shared persisted explode,
    * the q_lang_id shape); the model is vocab × languages rows keyed
    * by 8-byte-hashable words; classification is one vocab-keyed join
    * + one (doc, lang) aggregation. Priors/totals are language-sized
    * broadcasts. Nothing ever collects.
    */
  private val naiveBayes = QueryDef(
    "q_naive_bayes",
    "Multinomial naive-Bayes language classifier: Laplace-smoothed " +
      "word likelihoods (9-grid decimal ln terms) trained on the " +
      "doc_id%5<>0 split, test docs classified by exact-decimal " +
      "argmax posterior - output is the test confusion matrix.",
    Some("""WITH toks AS (SELECT doc_id, lang,
           |                     unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS w
           |              FROM documents),
           |tr AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
           |cnt AS (SELECT lang AS plang, w, CAST(count(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2),
           |tot AS (SELECT plang, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
           |vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM cnt),
           |pr AS (SELECT lang AS plang,
           |              CAST(round(ln(CAST(count(DISTINCT doc_id) AS DOUBLE)
           |                / (SELECT count(DISTINCT doc_id) FROM tr)), 9) AS DECIMAL(18,9)) AS prior
           |       FROM tr GROUP BY 1),
           |tw AS (SELECT doc_id, min(lang) AS actual_lang, w, CAST(count(*) AS BIGINT) AS k
           |       FROM toks WHERE doc_id % 5 = 0 GROUP BY doc_id, w),
           |vocab AS (SELECT DISTINCT w FROM tw),
           |wl AS (SELECT t.plang, vo.w,
           |              CAST(round(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / (t.tot + vv.v)), 9) AS DECIMAL(18,9)) AS lp
           |       FROM vocab vo CROSS JOIN tot t CROSS JOIN vv
           |       LEFT JOIN cnt c ON c.plang = t.plang AND c.w = vo.w),
           |sc AS (SELECT tw.doc_id, min(tw.actual_lang) AS actual_lang, wl.plang,
           |              sum(CAST(tw.k AS DECIMAL(10,0)) * wl.lp) AS sl
           |       FROM tw JOIN wl ON tw.w = wl.w GROUP BY tw.doc_id, wl.plang),
           |fin AS (SELECT sc.doc_id, sc.actual_lang, sc.plang, pr.prior + sc.sl AS score
           |        FROM sc JOIN pr ON pr.plang = sc.plang),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
           |       FROM fin)
           |SELECT actual_lang, plang AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
           |FROM rk WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val toks = documentsSpread(s, d)
        .select(col("doc_id"), col("lang"),
          explode(expr("regexp_extract_all(lower(text), '([a-z]+)', 1)")).as("w"))
        .persist()
      val tr = toks.filter(col("doc_id") % 5 =!= 0)
      val cnt = tr.groupBy(col("lang").as("plang"), col("w"))
        .agg(lng(count(lit(1))).as("c"))
        .persist()
      val tot = cnt.groupBy("plang").agg(lng(sum(col("c"))).as("tot"))
      val vv = cnt.agg(lng(countDistinct(col("w"))).as("v"))
      val prDocs = tr.groupBy(col("lang").as("plang"))
        .agg(countDistinct(col("doc_id")).as("nd"))
      val prTot = prDocs.agg(sum(col("nd")).as("ndt"))
      val pr = prDocs.crossJoin(broadcast(prTot))
        .select(col("plang"),
          round(log(dbl(col("nd")) / col("ndt")), 9)
            .cast(DecimalType(18, 9)).as("prior"))
      val tw = toks.filter(col("doc_id") % 5 === 0)
        .groupBy("doc_id", "w")
        .agg(min(col("lang")).as("actual_lang"), lng(count(lit(1))).as("k"))
        .persist()
      val vocab = tw.select("w").distinct()
      val wl = vocab.crossJoin(broadcast(tot)).crossJoin(broadcast(vv))
        .join(cnt, Seq("plang", "w"), "left")
        .select(col("plang"), col("w"),
          round(log(dbl(coalesce(col("c"), lit(0L)) + 1) / (col("tot") + col("v"))), 9)
            .cast(DecimalType(18, 9)).as("lp"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("plang"))
      materializeThenRelease(
        tw.join(wl, "w")
          .groupBy("doc_id", "plang")
          .agg(min(col("actual_lang")).as("actual_lang"),
            sum(col("k").cast(DecimalType(10, 0)) * col("lp")).as("sl"))
          .join(broadcast(pr), "plang")
          .withColumn("score", col("prior") + col("sl"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("actual_lang"), col("plang").as("pred_lang"))
          .agg(lng(count(lit(1))).as("n_docs")),
        toks, cnt, tw)
        .orderBy("actual_lang", "pred_lang")
    }
  )

  /** Smoothed mean target encoding — the feature-engineering step that
    * turns a high-cardinality categorical into one numeric column
    * without a width explosion (the alternative, one-hot, is exactly
    * what breaks at web-scale cardinalities). enc(cat) shrinks the
    * category mean toward the global mean with pseudo-count m = 20,
    * so rare categories don't memorize their few labels.
    *
    * Determinism: category sums are exact DECIMAL; the encoding is ONE
    * shared IEEE chain (two divisions, one addition) over exact
    * aggregates, rounded 6. Scale: one broadcast dim join + one
    * map-side-combined fact aggregation to |categories| rows; the
    * global mean is a single-row broadcast.
    */
  private val targetEncode = QueryDef(
    "q_target_encode",
    "Smoothed mean target encoding of part brand against lineitem " +
      "revenue (pseudo-count m = 20 shrinkage toward the global " +
      "mean): per brand the support, raw mean and encoded value.",
    Some("""WITH f AS (SELECT p.p_brand, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS t
           |           FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
           |g AS (SELECT CAST(count(*) AS BIGINT) AS ng, CAST(sum(t) AS DOUBLE) AS sg FROM f),
           |c AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n, CAST(sum(t) AS DOUBLE) AS st
           |      FROM f GROUP BY 1)
           |SELECT p_brand, n, round(st / n, 6) AS raw_mean,
           |       round((st + 20 * (sg / ng)) / (n + 20), 6) AS enc
           |FROM c CROSS JOIN g ORDER BY p_brand""".stripMargin),
    (s, d) => {
      val f = lineitem(s, d).select(col("l_partkey"), money(col("l_extendedprice")).as("t"))
        .join(broadcast(part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("t"))
        .persist()
      val g = f.agg(lng(count(lit(1))).as("ng"), dbl(sum(col("t"))).as("sg"))
      materializeThenRelease(
        f.groupBy("p_brand")
          .agg(lng(count(lit(1))).as("n"), dbl(sum(col("t"))).as("st"))
          .crossJoin(broadcast(g))
          .select(col("p_brand"), col("n"),
            round(col("st") / col("n"), 6).as("raw_mean"),
            round((col("st") + lit(20) * (col("sg") / col("ng"))) / (col("n") + 20), 6)
              .as("enc")),
        f)
        .orderBy("p_brand")
    }
  )

  /** k-fold cross-validation of the nearest-centroid classifier — the
    * model-selection harness over the classifier the inventory already
    * evaluates in-sample (q_centroid_confusion measures training-set
    * confusion; this measures HELD-OUT accuracy, the number a model
    * card actually reports). Folds are vec_id % 5.
    *
    * The scale trick is leave-fold-out ALGEBRA, not k re-trainings:
    * per (label, dim) the corpus is aggregated ONCE into total scaled
    * sums/counts plus per-(fold, label, dim) partials, and fold f's
    * training centroid is (S_total − S_f)/(n_total − n_f) — k=5
    * centroid sets from one fact pass (a k-pass design would re-scan
    * the corpus 5×; this is why CV at 100 TB is feasible at all).
    *
    * Determinism: the q_centroid_confusion integer discipline end to
    * end — 1e10-scaled BIGINT component sums (subtraction stays
    * exact), centroid means rounded to 1e9 units via floor(x+0.5) on
    * a < 2^53 double, 1e12-scaled BIGINT distance terms, argmin ties
    * to lowest label; accuracy is ONE division of exact BIGINTs.
    * Requires every label in ≥ 2 folds (any real corpus; a label
    * entirely inside one fold would divide by zero loudly).
    *
    * Scale: fold×label×dim centroid grid is tiny and broadcast; each
    * vector scores K distances against ITS fold's centroid arrays via
    * one sequential zip_with fold (the shared shape); the argmin
    * window partitions by vec_id; output is k rows.
    */
  private val crossVal = QueryDef(
    "q_cross_val",
    "5-fold cross-validation of the nearest-centroid classifier via " +
      "leave-fold-out algebra (total-minus-fold centroid sums - ONE " +
      "fact pass, not 5 re-trainings): per fold the held-out test " +
      "count, correct count and accuracy.",
    Some(s"""WITH el AS (SELECT vec_id, label, vec_id % 5 AS fold,
            |                  unnest(generate_series(1, len(embedding))) AS dim,
            |                  unnest(embedding) AS v
            |           FROM embeddings),
            |sc AS (SELECT label, fold, dim,
            |              sum(CAST(floor(CAST(v AS DOUBLE) * 10000000000 + 0.5) AS BIGINT)) AS s,
            |              count(*) AS n
            |       FROM el GROUP BY 1, 2, 3),
            |tot AS (SELECT label, dim, sum(s) AS st, sum(n) AS nt FROM sc GROUP BY 1, 2),
            |folds AS (SELECT unnest(generate_series(0, 4)) AS fold),
            |cent AS (SELECT f.fold, t.label AS clabel, t.dim,
            |                CAST(floor(CAST(t.st - coalesce(sc.s, 0) AS DOUBLE)
            |                  / (10.0 * (t.nt - coalesce(sc.n, 0))) + 0.5) AS BIGINT) AS c_e9
            |         FROM tot t CROSS JOIN folds f
            |         LEFT JOIN sc ON sc.label = t.label AND sc.dim = t.dim AND sc.fold = f.fold),
            |dist AS (SELECT el.vec_id, el.fold, el.label AS true_label, cent.clabel,
            |                sum($DistTermSql) AS d2
            |         FROM el JOIN cent ON cent.dim = el.dim AND cent.fold = el.fold
            |         GROUP BY 1, 2, 3, 4),
            |pred AS (SELECT vec_id, fold, true_label, clabel,
            |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn
            |         FROM dist)
            |SELECT CAST(fold AS BIGINT) AS fold,
            |       CAST(count(*) AS BIGINT) AS n_test,
            |       CAST(sum(CASE WHEN clabel = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
            |       round(CAST(sum(CASE WHEN clabel = true_label THEN 1 ELSE 0 END) AS DOUBLE)
            |             / count(*), 6) AS accuracy
            |FROM pred WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val el = embeddings(s, d)
        .select(col("vec_id"), col("label"), (col("vec_id") % 5).as("fold"),
          posexplode(col("embedding")).as(Seq("dim0", "v")))
        .select(col("label"), col("fold"), (col("dim0") + 1).as("dim"), col("v"))
      val sc = el.groupBy("label", "fold", "dim")
        .agg(sum(floor(dbl(col("v")) * 10000000000L + 0.5).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .persist()
      val tot = sc.groupBy("label", "dim")
        .agg(sum("s").as("st"), sum("n").as("nt"))
      val folds = s.range(5).select(col("id").as("fold"))
      // leave-fold-out centroid: exact BIGINT subtraction, then the
      // shared floor(x+0.5)-to-1e9-units rounding on a < 2^53 double
      val cent = tot.crossJoin(broadcast(folds))
        .join(sc, Seq("label", "dim", "fold"), "left")
        .select(col("fold"), col("label").as("clabel"), col("dim"),
          floor(dbl(col("st") - coalesce(col("s"), lit(0L)))
            / (lit(10.0) * (col("nt") - coalesce(col("n"), lit(0L)))) + 0.5)
            .cast("long").as("c_e9"))
      val centArr = cent.groupBy("fold", "clabel")
        .agg(expr("transform(sort_array(collect_list(struct(dim, c_e9)))," +
          " t -> CAST(t.c_e9 AS DOUBLE) / 1000000000.0)").as("carr"))
      // spread the CPU-bound distance fold before the broadcast join
      // (the centroidDistances discipline)
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
      embeddings(s, d)
        .select(col("vec_id"), col("label").as("true_label"),
          (col("vec_id") % 5).as("fold"), col("embedding"))
        .repartition(s.sparkContext.defaultParallelism)
        .join(broadcast(centArr), "fold")
        .select(col("vec_id"), col("fold"), col("true_label"), col("clabel"),
          expr(
            """aggregate(
              |  zip_with(embedding, carr,
              |    (x, y) -> CAST(floor((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) * 1000000000000 + 0.5) AS BIGINT)),
              |  0L, (acc, e) -> acc + e)""".stripMargin).as("d2"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("fold")
        .agg(lng(count(lit(1))).as("n_test"),
          lng(sum(when(col("clabel") === col("true_label"), 1L).otherwise(0L)))
            .as("n_correct"))
        .select(lng(col("fold")).as("fold"), col("n_test"), col("n_correct"),
          round(dbl(col("n_correct")) / col("n_test"), 6).as("accuracy"))
        .transform(materializeThenRelease(_, sc))
        .orderBy("fold")
    }
  )

  /** One gradient-boosting round for REGRESSION — the residual-fitting
    * complement to [[adaboostRound]] (which boosts a classifier by
    * reweighting; this boosts a regressor by refitting residuals, the
    * GBDT/XGBoost step): f₀ = global mean, stump 1 splits quantity
    * bins to minimize residual SSE, stump 2 refits the NEW residuals
    * on discount bins, and the staged train RMSE (non-increasing by
    * construction) is reported per stage with the chosen splits.
    *
    * Determinism: residuals stay EXACT decimals end to end — f₀ and
    * every leaf value are round-6 grid doubles cast back to
    * DECIMAL(18,6) before subtracting (the adaboost 6-grid
    * discipline), so r, r² and their sums are exact and
    * order-independent; each candidate's SSE-reduction score
    * S_L²/n_L + S_R²/n_R is ONE fixed IEEE chain over exact decimal
    * sums cast to double (correctly rounded in both engines), rounded
    * to the 6-grid for the argmax, ties to the lower threshold; RMSE
    * is sqrt of an exact decimal sum divided once.
    *
    * Scale: each stage is ONE map-side-combined fact aggregation to
    * ≤ 11 bins; split search runs entirely on the bins-sized frame
    * (cumulative sums via the stump self-join trick — no Window, no
    * per-threshold re-scan); chosen-split parameters broadcast back
    * as single rows. Boosting is inherently sequential in stages, so
    * 3 fact passes (residual 0/1/2) is the floor — each is linear.
    */
  private val gbdtRound = QueryDef(
    "q_gbdt_round",
    "One gradient-boosting regression round on extendedprice: f0 = " +
      "global mean, stump 1 on quantity bins (SSE argmin over exact " +
      "decimal residual sums), stump 2 refit on the new residuals " +
      "over discount bins; per stage the chosen split, round-6 leaf " +
      "values and the non-increasing train RMSE.",
    Some("""WITH f AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
           |                  CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS db,
           |                  CAST(l_extendedprice AS DECIMAL(18,2)) AS y
           |           FROM lineitem),
           |m AS (SELECT round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS f0 FROM f),
           |r1 AS (SELECT least(9, (qty - 1) // 5) AS bin, db,
           |              CAST(y - CAST(m.f0 AS DECIMAL(18,6)) AS DECIMAL(12,6)) AS r
           |       FROM f CROSS JOIN m),
           |c1 AS (SELECT bin, sum(r) AS s, count(*) AS c FROM r1 GROUP BY 1),
           |t1 AS (SELECT sum(s) AS st, sum(c) AS ct FROM c1),
           |cum1 AS (SELECT a.bin AS thr, sum(b.s) AS sl, sum(b.c) AS cl
           |         FROM c1 a JOIN c1 b ON b.bin <= a.bin GROUP BY 1),
           |g1 AS (SELECT thr, sl, cl, t1.st - sl AS sr, t1.ct - cl AS cr,
           |              round((CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / cl
           |                  + (CAST(t1.st - sl AS DOUBLE) * CAST(t1.st - sl AS DOUBLE)) / (t1.ct - cl), 6) AS score
           |       FROM cum1 CROSS JOIN t1 WHERE thr < 9 AND cl > 0 AND t1.ct - cl > 0),
           |b1 AS (SELECT thr, round(CAST(sl AS DOUBLE) / cl, 6) AS ll,
           |              round(CAST(sr AS DOUBLE) / cr, 6) AS lr
           |       FROM g1 WHERE score = (SELECT max(score) FROM g1)
           |       ORDER BY thr LIMIT 1),
           |r2 AS (SELECT r1.db,
           |              CAST(r1.r - CAST(CASE WHEN r1.bin <= b1.thr THEN b1.ll ELSE b1.lr END AS DECIMAL(18,6)) AS DECIMAL(12,6)) AS r
           |       FROM r1 CROSS JOIN b1),
           |c2 AS (SELECT db AS bin, sum(r) AS s, count(*) AS c FROM r2 GROUP BY 1),
           |t2 AS (SELECT sum(s) AS st, sum(c) AS ct FROM c2),
           |cum2 AS (SELECT a.bin AS thr, sum(b.s) AS sl, sum(b.c) AS cl
           |         FROM c2 a JOIN c2 b ON b.bin <= a.bin GROUP BY 1),
           |g2 AS (SELECT thr, sl, cl, t2.st - sl AS sr, t2.ct - cl AS cr,
           |              round((CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)) / cl
           |                  + (CAST(t2.st - sl AS DOUBLE) * CAST(t2.st - sl AS DOUBLE)) / (t2.ct - cl), 6) AS score
           |       FROM cum2 CROSS JOIN t2 WHERE thr < 10 AND cl > 0 AND t2.ct - cl > 0),
           |b2 AS (SELECT thr, round(CAST(sl AS DOUBLE) / cl, 6) AS ll,
           |              round(CAST(sr AS DOUBLE) / cr, 6) AS lr
           |       FROM g2 WHERE score = (SELECT max(score) FROM g2)
           |       ORDER BY thr LIMIT 1),
           |r3 AS (SELECT CAST(r2.r - CAST(CASE WHEN r2.db <= b2.thr THEN b2.ll ELSE b2.lr END AS DECIMAL(18,6)) AS DECIMAL(12,6)) AS r
           |       FROM r2 CROSS JOIN b2),
           |e0 AS (SELECT round(sqrt(CAST(sum(CAST(r AS DECIMAL(24,6)) * r) AS DOUBLE) / count(*)), 6) AS rmse FROM r1),
           |e1 AS (SELECT round(sqrt(CAST(sum(CAST(r AS DECIMAL(24,6)) * r) AS DOUBLE) / count(*)), 6) AS rmse FROM r2),
           |e2 AS (SELECT round(sqrt(CAST(sum(CAST(r AS DECIMAL(24,6)) * r) AS DOUBLE) / count(*)), 6) AS rmse FROM r3)
           |SELECT * FROM (
           |  SELECT CAST(0 AS BIGINT) AS stage, 'const' AS feature, CAST(-1 AS BIGINT) AS thr,
           |         m.f0 AS leaf_left, m.f0 AS leaf_right, e0.rmse AS rmse
           |  FROM m CROSS JOIN e0
           |  UNION ALL
           |  SELECT 1, 'quantity_bin', CAST(b1.thr AS BIGINT), b1.ll, b1.lr, e1.rmse
           |  FROM b1 CROSS JOIN e1
           |  UNION ALL
           |  SELECT 2, 'discount_pct', CAST(b2.thr AS BIGINT), b2.ll, b2.lr, e2.rmse
           |  FROM b2 CROSS JOIN e2)
           |ORDER BY stage""".stripMargin),
    (s, d) => {
      val dec6 = DecimalType(18, 6)
      val dec12 = DecimalType(12, 6)
      val f = lineitem(s, d).select(
          col("l_quantity").cast("long").as("qty"),
          (col("l_discount").cast(DecimalType(4, 2)) * 100).cast("long").as("db"),
          money(col("l_extendedprice")).as("y"))
      val m = f.agg(round(dbl(sum(col("y"))) / count(lit(1)), 6).as("f0"))
      val r1 = f.crossJoin(broadcast(m))
        .select(least(lit(9L), expr("(qty - 1) div 5")).as("bin"), col("db"),
          (col("y") - col("f0").cast(dec6)).cast(dec12).as("r"))
        .persist()
      // split search over the bins-sized frame: cumsums via the stump
      // self-join trick, SSE-reduction score on the 6-grid, argmax with
      // lower-threshold tie-break → ONE broadcastable (thr, ll, lr) row
      val held = Seq.newBuilder[org.apache.spark.sql.DataFrame]
      def bestSplit(rf: org.apache.spark.sql.DataFrame, binCol: String,
          maxBin: Int): org.apache.spark.sql.DataFrame = {
        val c = rf.groupBy(col(binCol).as("bin"))
          .agg(sum("r").as("s"), count(lit(1)).as("c")).persist()
        held += c
        val t = c.agg(sum("s").as("st"), sum("c").as("ct"))
        val cum = c.as("a").join(c.as("b"), col("b.bin") <= col("a.bin"))
          .groupBy(col("a.bin").as("thr"))
          .agg(sum("b.s").as("sl"), sum("b.c").as("cl"))
        cum.crossJoin(broadcast(t))
          .filter(col("thr") < maxBin && col("cl") > 0 &&
            (col("ct") - col("cl")) > 0)
          .select(col("thr"), col("sl"), col("cl"),
            (col("st") - col("sl")).as("sr"), (col("ct") - col("cl")).as("cr"),
            round((dbl(col("sl")) * dbl(col("sl"))) / col("cl")
              + (dbl(col("st") - col("sl")) * dbl(col("st") - col("sl")))
                / (col("ct") - col("cl")), 6).as("score"))
          .orderBy(col("score").desc, col("thr")).limit(1)
          .select(col("thr"), round(dbl(col("sl")) / col("cl"), 6).as("ll"),
            round(dbl(col("sr")) / col("cr"), 6).as("lr"))
      }
      def rmse(rf: org.apache.spark.sql.DataFrame) =
        rf.agg(round(sqrt(dbl(sum(col("r") * col("r"))) / count(lit(1))), 6)
          .as("rmse"))
      val b1 = bestSplit(r1, "bin", 9)
      val r2 = r1.crossJoin(broadcast(b1))
        .select(col("db"),
          (col("r") - when(col("bin") <= col("thr"), col("ll"))
            .otherwise(col("lr")).cast(dec6)).cast(dec12).as("r"))
        .persist()
      val b2 = bestSplit(r2, "db", 10)
      val r3 = r2.crossJoin(broadcast(b2))
        .select((col("r") - when(col("db") <= col("thr"), col("ll"))
          .otherwise(col("lr")).cast(dec6)).cast(dec12).as("r"))
      val s0 = m.crossJoin(rmse(r1))
        .select(lit(0L).as("stage"), lit("const").as("feature"),
          lit(-1L).as("thr"), col("f0").as("leaf_left"),
          col("f0").as("leaf_right"), col("rmse"))
      val s1 = b1.crossJoin(rmse(r2))
        .select(lit(1L).as("stage"), lit("quantity_bin").as("feature"),
          lng(col("thr")).as("thr"), col("ll").as("leaf_left"),
          col("lr").as("leaf_right"), col("rmse"))
      val s2 = b2.crossJoin(rmse(r3))
        .select(lit(2L).as("stage"), lit("discount_pct").as("feature"),
          lng(col("thr")).as("thr"), col("ll").as("leaf_left"),
          col("lr").as("leaf_right"), col("rmse"))
      materializeThenRelease(s0.unionByName(s1).unionByName(s2),
        (held.result() :+ r1 :+ r2): _*)
        .orderBy("stage")
    }
  )

  val defs: Seq[QueryDef] = Seq(classWeights, knnClassify, centroidConfusion,
    silhouette, powerlaw, mutualInfo, ndcg, f1Macro, mccKappa, infoValue,
    stump, logregStep, adaboostRound, naiveBayes, targetEncode, crossVal,
    gbdtRound)
}
