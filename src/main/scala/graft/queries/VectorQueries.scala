package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Vector / similarity-search inventory (SURVEY.md §2.3 q_knn_join,
  * §2.6 q_topk_knn, §2.4 centroid, §2.8 array HOFs).
  *
  * The reference's retrieval path (rag_chatbot/main.py:27,36,39-47) is an
  * *exact* brute-force squared-L2 scan (faiss.IndexFlatL2) with k=1 and a
  * refusal threshold — exactness is what makes it oracle-checkable, and
  * the O(N·d) scan is exactly what Spark parallelizes.
  *
  * Scale design: the probe set is the small side and is broadcast, so
  * the big corpus never shuffles for the distance computation; per-probe
  * top-k is a window over the probe partition. At 100 TB the same plan
  * holds (probes broadcast, corpus scanned partition-parallel); the
  * LSH-bucketed ANN variant in DedupQueries is the sub-linear path.
  */
object VectorQueries {

  /** Distance gate. The reference uses 1.0 for MiniLM embeddings
    * (rag_chatbot/main.py:39); the synthetic 64-d vectors have per-probe
    * min squared-L2 ≈ 1.0–1.4, so 1.28 keeps both the match and the
    * refusal branch exercised at every scale factor.
    */
  private val Threshold = 1.28
  /** Reference refusal string, rag_chatbot/main.py:43. */
  private val Refusal = "I don't have information on that subject."

  private def l2Duck(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"

  private val topkKnn = QueryDef(
    "q_topk_knn",
    "The reference's full retrieval semantics (rag_chatbot/main.py:31-47):" +
      " exact top-1 squared-L2 neighbor per probe, threshold gate, refusal" +
      " fallback. Probes broadcast; ties broken on vec_id.",
    Some(s"""WITH probes AS (SELECT * FROM embeddings WHERE vec_id < 10),
            |corpus AS (SELECT * FROM embeddings WHERE vec_id >= 10),
            |dists AS (
            |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, c.label,
            |         round(${l2Duck("p.embedding", "c.embedding")}, 6) AS d2
            |  FROM probes p CROSS JOIN corpus c),
            |ranked AS (
            |  SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY d2, cand_id) AS rn
            |  FROM dists)
            |SELECT probe_id, cand_id AS match_id, d2,
            |       CASE WHEN d2 > $Threshold
            |            THEN 'I don''t have information on that subject.'
            |            ELSE 'label=' || CAST(label AS VARCHAR) END AS answer
            |FROM ranked WHERE rn = 1 ORDER BY probe_id""".stripMargin),
    (s, d) => {
      val e = embeddings(s, d)
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      val corpus = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"), col("label"))
      val w = Window.partitionBy("probe_id").orderBy("d2", "cand_id")
      corpus.join(broadcast(probes))
        .withColumn("d2", round(l2sq("p_emb", "c_emb"), 6))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("probe_id"), col("cand_id").as("match_id"), col("d2"),
          when(col("d2") > Threshold, lit(Refusal))
            .otherwise(concat(lit("label="), col("label").cast("string"))).as("answer"))
        .orderBy("probe_id")
    }
  )

  private val knnJoin = QueryDef(
    "q_knn_join",
    "General k-NN similarity join (k=3) per probe — same broadcast plan " +
      "as q_topk_knn without the threshold gate.",
    Some(s"""WITH probes AS (SELECT * FROM embeddings WHERE vec_id < 10),
            |corpus AS (SELECT * FROM embeddings WHERE vec_id >= 10),
            |dists AS (
            |  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
            |         round(${l2Duck("p.embedding", "c.embedding")}, 6) AS d2
            |  FROM probes p CROSS JOIN corpus c),
            |ranked AS (
            |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY d2, cand_id) AS BIGINT) AS rk
            |  FROM dists)
            |SELECT probe_id, rk, cand_id, d2
            |FROM ranked WHERE rk <= 3 ORDER BY probe_id, rk""".stripMargin),
    (s, d) => {
      val e = embeddings(s, d)
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
      val corpus = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
      val w = Window.partitionBy("probe_id").orderBy("d2", "cand_id")
      corpus.join(broadcast(probes))
        .withColumn("d2", round(l2sq("p_emb", "c_emb"), 6))
        .withColumn("rk", lng(row_number().over(w)))
        .filter(col("rk") <= 3)
        .select("probe_id", "rk", "cand_id", "d2")
        .orderBy("probe_id", "rk")
    }
  )

  private val vecCentroid = QueryDef(
    "q_vec_centroid",
    "Per-label centroid (ML feature prep): posexplode to (label, pos, " +
      "val), exact decimal sums per position, single double division. " +
      "One shuffle keyed by (label, pos); at scale this is the standard " +
      "dimension-parallel mean-vector pattern.",
    Some("""WITH x AS (
           |  SELECT label,
           |         unnest(generate_series(1, len(embedding))) AS ord,
           |         unnest(embedding) AS val
           |  FROM embeddings)
           |SELECT label, CAST(ord - 1 AS BIGINT) AS pos,
           |       round(CAST(sum(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS centroid
           |FROM x GROUP BY label, ord ORDER BY label, pos""".stripMargin),
    (s, d) => embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy("label", "pos")
      .agg(round(dbl(sum(col("val").cast("decimal(20,10)"))) / count(lit(1)), 6)
        .as("centroid"))
      .select(col("label"), lng(col("pos")).as("pos"), col("centroid"))
      .orderBy("label", "pos")
  )

  private val arrayFns = QueryDef(
    "q_array_fns",
    "Array higher-order functions (SURVEY §2.8): size, element access, " +
      "slice, norms, elementwise transform+aggregate — codegen'd HOFs, " +
      "no UDFs.",
    Some("""SELECT vec_id,
           |       CAST(len(embedding) AS BIGINT) AS dim,
           |       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           |       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm2,
           |       round(list_sum(list_transform(embedding[1:8], x -> abs(CAST(x AS DOUBLE)))), 6) AS l1_head,
           |       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
           |FROM embeddings ORDER BY vec_id""".stripMargin),
    (s, d) => embeddings(s, d).select(
      col("vec_id"),
      lng(size(col("embedding"))).as("dim"),
      round(dbl(element_at(col("embedding"), 1)), 6).as("first_val"),
      round(norm2("embedding"), 6).as("norm2"),
      round(expr("aggregate(slice(embedding, 1, 8), CAST(0 AS DOUBLE), (acc, x) -> acc + abs(CAST(x AS DOUBLE)))"), 6).as("l1_head"),
      lng(size(filter(col("embedding"), _ > 0))).as("n_pos"))
      .orderBy("vec_id")
  )

  // -------------------------------------------------------------- vec quant

  private val vecQuant = QueryDef(
    "q_vec_quant",
    "Int8 scalar quantization of the embedding corpus — the 4× " +
      "compression an ANN serving tier applies before indexing 100 TB " +
      "of vectors. Pass 1: per-dimension [min, max] over the corpus " +
      "via posexplode + aggregate (64·N rows, map-side combined to 64 " +
      "partials); the 64-row codebook is BROADCAST back. Pass 2: each " +
      "element maps to floor((v−min)·254/(max−min)) clamped to " +
      "[0,254] — one shared float chain, identical in both engines. " +
      "Output per vector: code checksum + min/max code, proving the " +
      "full codebook round-trip without 64 output columns. Constant " +
      "dimension guard: max=min ⇒ code 0 (both engines).",
    Some("""WITH el AS (SELECT vec_id, unnest(range(len(embedding))) AS dim,
           |                   CAST(unnest(embedding) AS DOUBLE) AS v
           |            FROM embeddings),
           |cb AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM el GROUP BY 1),
           |codes AS (SELECT el.vec_id,
           |            CASE WHEN cb.mx = cb.mn THEN 0
           |                 ELSE CAST(least(254, greatest(0,
           |                   floor((el.v - cb.mn) * 254 / (cb.mx - cb.mn)))) AS BIGINT)
           |            END AS code
           |          FROM el JOIN cb ON el.dim = cb.dim)
           |SELECT vec_id, CAST(sum(code) AS BIGINT) AS code_sum,
           |       CAST(min(code) AS BIGINT) AS code_min,
           |       CAST(max(code) AS BIGINT) AS code_max
           |FROM codes GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val el = embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "vf")))
        .select(col("vec_id"), col("dim"), dbl(col("vf")).as("v"))
      val cb = el.groupBy("dim").agg(min("v").as("mn"), max("v").as("mx"))
      el.join(broadcast(cb), "dim")
        .select(col("vec_id"),
          when(col("mx") === col("mn"), lit(0L))
            .otherwise(lng(least(lit(254), greatest(lit(0),
              floor((col("v") - col("mn")) * 254 / (col("mx") - col("mn")))))))
            .as("code"))
        .groupBy("vec_id")
        .agg(lng(sum(col("code"))).as("code_sum"),
          lng(min(col("code"))).as("code_min"),
          lng(max(col("code"))).as("code_max"))
        .orderBy("vec_id")
    }
  )

  /** Embedding-distribution drift monitoring: partition the corpus
    * into deterministic ingestion batches (vec_id % 8 stands in for
    * arrival order), compute each batch's mean vector with the
    * q_vec_centroid exact-decimal discipline, and report the cosine
    * between consecutive batch centroids — the standard readout an
    * embedding pipeline alarms on when a model version or upstream
    * corpus shifts.
    *
    * Float parity: centroid components round to the 6-decimal grid
    * and are cast DECIMAL(18,6); every dot-product term m_a·m_b is
    * then EXACT decimal, scaled to a BIGINT per term (×10¹²) and
    * summed as int64 — so accumulation order cannot matter and no
    * wide decimal is ever cast to double. The final cosine is
    * int64→double (exact ≤ 2⁵³), sqrt and one division — all
    * IEEE-exact-rounded.
    *
    * Scale: one posexplode keyed by (batch, dim) — the same
    * dimension-parallel shape as q_vec_centroid; the consecutive-
    * batch join is on (batch+1, dim) over a BATCHES×dim table, which
    * is bounded by batch count, not corpus size.
    */
  private val embedDrift = QueryDef(
    "q_embed_drift",
    "Centroid drift between consecutive ingestion batches (vec_id % " +
      "8): exact-decimal batch centroids, per-dimension scaled-BIGINT " +
      "dot products, cosine between batch g and g+1 with batch sizes.",
    Some("""WITH g AS (SELECT vec_id % 8 AS grp,
           |         unnest(generate_series(1, len(embedding))) AS ord, unnest(embedding) AS val
           |       FROM embeddings),
           |c AS (SELECT grp, ord - 1 AS pos,
           |        CAST(round(CAST(sum(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS m,
           |        count(*) AS n
           |      FROM g GROUP BY grp, ord),
           |n AS (SELECT grp, CAST(max(n) AS BIGINT) AS n FROM c GROUP BY grp),
           |p AS (SELECT a.grp AS g1, b.grp AS g2,
           |        sum(CAST(a.m * b.m * 1000000000000 AS BIGINT)) AS sab,
           |        sum(CAST(a.m * a.m * 1000000000000 AS BIGINT)) AS saa,
           |        sum(CAST(b.m * b.m * 1000000000000 AS BIGINT)) AS sbb
           |      FROM c a JOIN c b ON b.grp = a.grp + 1 AND b.pos = a.pos
           |      GROUP BY 1, 2)
           |SELECT g1, g2, na.n AS n_a, nb.n AS n_b,
           |       round(CAST(sab AS DOUBLE) / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE))), 6) AS cos_drift
           |FROM p JOIN n na ON na.grp = p.g1 JOIN n nb ON nb.grp = p.g2
           |ORDER BY g1""".stripMargin),
    (s, d) => {
      val c = embeddings(s, d)
        .select((col("vec_id") % 8).as("grp"),
          posexplode(col("embedding")).as(Seq("pos", "val")))
        .groupBy("grp", "pos")
        .agg(round(dbl(sum(col("val").cast("decimal(20,10)"))) / count(lit(1)), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("m"),
          count(lit(1)).as("n"))
      val n = c.groupBy("grp").agg(lng(max(col("n"))).as("n"))
      val a = c.select(col("grp").as("g1"), col("pos"), col("m").as("ma"))
      val b = c.select(col("grp").as("g2"), col("pos"), col("m").as("mb"))
      val p = a.join(b, col("g2") === col("g1") + 1 && a("pos") === b("pos"))
        .groupBy("g1", "g2")
        .agg(sum(expr("CAST(ma * mb * 1000000000000 AS BIGINT)")).as("sab"),
          sum(expr("CAST(ma * ma * 1000000000000 AS BIGINT)")).as("saa"),
          sum(expr("CAST(mb * mb * 1000000000000 AS BIGINT)")).as("sbb"))
      p.join(n.select(col("grp").as("g1"), col("n").as("n_a")), "g1")
        .join(n.select(col("grp").as("g2"), col("n").as("n_b")), "g2")
        .select(col("g1"), col("g2"), col("n_a"), col("n_b"),
          round(dbl(col("sab"))
            / (sqrt(dbl(col("saa"))) * sqrt(dbl(col("sbb")))), 6).as("cos_drift"))
        .orderBy("g1")
    }
  )

  /** Rounds of farthest-point selection (coreset size). */
  private val CoresetK = 8

  private val coresetDuck: String = {
    def l2(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    val head =
      s"""p1 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0),
         |m1 AS (SELECT c.vec_id, c.embedding, round(${l2("c.embedding", "p.embedding")}, 6) AS mind
         |       FROM embeddings c CROSS JOIN p1 p WHERE c.vec_id <> 0)""".stripMargin
    val steps = (2 to CoresetK).map { t =>
      val p = t - 1
      s"""p$t AS (SELECT vec_id, embedding, mind FROM m$p ORDER BY mind DESC, vec_id LIMIT 1),
         |m$t AS (SELECT m.vec_id, m.embedding, least(m.mind, round(${l2("m.embedding", "p.embedding")}, 6)) AS mind
         |         FROM m$p m CROSS JOIN p$t p WHERE m.vec_id <> p.vec_id)""".stripMargin
    }
    val sel = "SELECT 1 AS step, vec_id, 0.0 AS mind FROM p1 " +
      (2 to CoresetK).map(t => s"UNION ALL SELECT $t AS step, vec_id, mind FROM p$t").mkString(" ")
    s"WITH $head,\n${steps.mkString(",\n")}\n" +
      s"SELECT CAST(step AS BIGINT) AS step, vec_id, round(mind, 6) AS min_dist FROM ($sel) ORDER BY step"
  }

  /** Squared L2 between an array column and a literal vector — same
    * sequential left fold as Det.l2sqHof, so both engines accumulate
    * in identical element order.
    */
  private def l2sqToLit(a: org.apache.spark.sql.Column,
                        v: Seq[Float]): org.apache.spark.sql.Column =
    aggregate(
      zip_with(a, typedlit(v), (x, y) => (dbl(x) - dbl(y)) * (dbl(x) - dbl(y))),
      lit(0.0), (acc, x) => acc + x)

  /** Farthest-point (k-center greedy) coreset selection — the
    * diversity-sampling pass a data-selection pipeline runs to pick a
    * small representative subset of an embedding corpus (Sener &
    * Savarese's k-center objective; the exact greedy 2-approximation).
    *
    * Scale shape — the INCREMENTAL recurrence, not the naive rescan:
    * each round updates min-distances with ONE new distance per point
    * (least(mind, d(x, latest pick))) instead of re-scanning the whole
    * selected set, so total work is k corpus passes. The newest pick
    * ships to executors as a 64-float literal (no join, no shuffle —
    * the round is a pure projection), per-round state is persisted and
    * the predecessor unpersisted once materialized (linear lineage, no
    * cache residue), and driver state is one (id, vector) row per
    * round — the bounded driver-iteration rule. The argmax is a
    * global top-1 (TakeOrdered), never a global window.
    *
    * Float parity: distances round to the 6-decimal grid before
    * least/compare; argmax ties break on vec_id.
    */
  private val coreset = QueryDef(
    "q_coreset",
    s"Farthest-point coreset: $CoresetK greedy k-center rounds over " +
      "the embedding corpus seeded at vec_id 0, each picking the " +
      "point with maximal 6-decimal-grid min squared-L2 distance to " +
      "the selected set (vec_id tie-break), maintained incrementally.",
    Some(coresetDuck),
    (s, d) => {
      import s.implicits._
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val seed = e.filter(col("vec_id") === 0).collect().head
      val seedVec = seed.getSeq[Float](1).toVector
      val picks = Seq.newBuilder[(Long, Long, Double)]
      picks += ((1L, 0L, 0.0))
      var m = e.filter(col("vec_id") =!= 0)
        .withColumn("mind", round(l2sqToLit(col("embedding"), seedVec), 6))
        .persist()
      m.count()
      for (t <- 2 to CoresetK) {
        val pr = m.orderBy(col("mind").desc, col("vec_id")).limit(1)
          .collect().head // bounded driver state: one row per round
        val (pid, pvec, pmind) =
          (pr.getLong(0), pr.getSeq[Float](1).toVector, pr.getDouble(2))
        picks += ((t.toLong, pid, pmind))
        if (t < CoresetK) {
          val next = m.filter(col("vec_id") =!= pid)
            .withColumn("mind",
              least(col("mind"), round(l2sqToLit(col("embedding"), pvec), 6)))
            .persist()
          next.count() // materialize before dropping the predecessor
          m.unpersist()
          m = next
        }
      }
      m.unpersist()
      picks.result().toDF("step", "vec_id", "mind")
        .select(col("step"), col("vec_id"), round(col("mind"), 6).as("min_dist"))
        .orderBy("step")
    }
  )

  // -------------------------------------------------------------------- mmd

  private val mmd = QueryDef(
    "q_mmd",
    "Maximum mean discrepancy (RBF kernel) between embedding batches — " +
      "the kernel two-sample test that detects DISTRIBUTION shift where " +
      "q_embed_drift's centroid distance only detects MEAN shift (a " +
      "variance change or a mode split moves MMD but not the mean). " +
      "Two arms: 'natural' compares label-0 vs label-1 vectors; " +
      "'shifted' compares label-0 against a planted +0.5-on-dim-0 copy " +
      "of itself — the spec pins mmd²(shifted) > mmd²(natural), the " +
      "sensitivity readout that makes the statistic trustworthy. " +
      "SCALE CONTRACT: MMD is quadratic in the sample, so each side is " +
      "capped at the 512 smallest vec_ids (TakeOrdered, deterministic " +
      "at any corpus size) — kernel work is ≤ 3·512² evaluations " +
      "FOREVER, the fixed-budget two-sample pattern. Kernels are " +
      "rounded to 9 decimals BEFORE DECIMAL(28,9) summation (the " +
      "q_xentropy transcendental discipline: exp differs across libm " +
      "in the last ulp; the 9-grid absorbs it and exact decimal " +
      "addition kills float order-dependence). The planted shift is " +
      "FLOAT-domain arithmetic (0.5 is exactly representable; IEEE " +
      "single add is correctly rounded, so both engines produce the " +
      "identical shifted vector).",
    Some {
      val l2 = "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
      def k(aSrc: String, bSrc: String) =
        s"""SELECT sum(CAST(round(exp(-($l2) / 128e0), 9) AS DECIMAL(28,9))) AS s,
           |       count(*) AS n FROM $aSrc a JOIN $bSrc b ON true""".stripMargin
      s"""WITH x AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0
         |           ORDER BY vec_id LIMIT 512),
         |y1 AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1
         |       ORDER BY vec_id LIMIT 512),
         |y2 AS (SELECT vec_id, list_transform(embedding, (v, i) ->
         |         CASE WHEN i = 1 THEN CAST(v + CAST(0.5 AS FLOAT) AS FLOAT)
         |              ELSE v END) AS embedding FROM x),
         |kxx AS (${k("x", "x")}),
         |ky1 AS (${k("y1", "y1")}),
         |kxy1 AS (${k("x", "y1")}),
         |ky2 AS (${k("y2", "y2")}),
         |kxy2 AS (${k("x", "y2")}),
         |arm1 AS (SELECT 'natural' AS arm,
         |           CAST((SELECT count(*) FROM x) AS BIGINT) AS n_x,
         |           CAST((SELECT count(*) FROM y1) AS BIGINT) AS n_y,
         |           round(CAST(kxx.s AS DOUBLE) / kxx.n, 9) AS k_xx,
         |           round(CAST(ky1.s AS DOUBLE) / ky1.n, 9) AS k_yy,
         |           round(CAST(kxy1.s AS DOUBLE) / kxy1.n, 9) AS k_xy,
         |           round(CAST(kxx.s AS DOUBLE) / kxx.n + CAST(ky1.s AS DOUBLE) / ky1.n
         |                 - 2e0 * CAST(kxy1.s AS DOUBLE) / kxy1.n, 9) AS mmd2
         |         FROM kxx, ky1, kxy1),
         |arm2 AS (SELECT 'shifted' AS arm,
         |           CAST((SELECT count(*) FROM x) AS BIGINT) AS n_x,
         |           CAST((SELECT count(*) FROM y2) AS BIGINT) AS n_y,
         |           round(CAST(kxx.s AS DOUBLE) / kxx.n, 9) AS k_xx,
         |           round(CAST(ky2.s AS DOUBLE) / ky2.n, 9) AS k_yy,
         |           round(CAST(kxy2.s AS DOUBLE) / kxy2.n, 9) AS k_xy,
         |           round(CAST(kxx.s AS DOUBLE) / kxx.n + CAST(ky2.s AS DOUBLE) / ky2.n
         |                 - 2e0 * CAST(kxy2.s AS DOUBLE) / kxy2.n, 9) AS mmd2
         |         FROM kxx, ky2, kxy2)
         |SELECT * FROM arm1 UNION ALL SELECT * FROM arm2 ORDER BY arm""".stripMargin
    },
    (s, d) => {
      val e = embeddings(s, d)
      val x = e.filter(col("label") === 0)
        .select(col("vec_id"), col("embedding"))
        .orderBy("vec_id").limit(512)
      val y1 = e.filter(col("label") === 1)
        .select(col("vec_id"), col("embedding"))
        .orderBy("vec_id").limit(512)
      // planted +0.5f on dimension 0, in FLOAT domain (Spark lambdas
      // index 0-based; the oracle's DuckDB lambda is 1-based)
      val y2 = x.select(col("vec_id"), expr(
        """transform(embedding, (v, i) ->
          |  IF(i = 0, CAST(v + CAST(0.5 AS FLOAT) AS FLOAT), v))"""
          .stripMargin).as("embedding"))
      def kmean(a: org.apache.spark.sql.DataFrame,
                b: org.apache.spark.sql.DataFrame) =
        a.select(col("embedding").as("ea"))
          .join(broadcast(b.select(col("embedding").as("eb"))))
          .select(round(exp(-l2sq("ea", "eb") / lit(128.0)), 9)
            .cast("decimal(28,9)").as("k"))
          .agg(sum(col("k")).as("s"), count(lit(1)).as("n"))
      def arm(name: String, b: org.apache.spark.sql.DataFrame) = {
        val kxx = kmean(x, x).select(col("s").as("sxx"), col("n").as("nxx"))
        val kyy = kmean(b, b).select(col("s").as("syy"), col("n").as("nyy"))
        val kxy = kmean(x, b).select(col("s").as("sxy"), col("n").as("nxy"))
        val nx = x.agg(count(lit(1)).as("n_x"))
        val ny = b.agg(count(lit(1)).as("n_y"))
        val mxx = dbl(col("sxx")) / col("nxx")
        val myy = dbl(col("syy")) / col("nyy")
        val mxy = dbl(col("sxy")) / col("nxy")
        kxx.crossJoin(broadcast(kyy)).crossJoin(broadcast(kxy))
          .crossJoin(broadcast(nx)).crossJoin(broadcast(ny))
          .select(lit(name).as("arm"), lng(col("n_x")).as("n_x"),
            lng(col("n_y")).as("n_y"),
            round(mxx, 9).as("k_xx"), round(myy, 9).as("k_yy"),
            round(mxy, 9).as("k_xy"),
            round(mxx + myy - lit(2.0) * mxy, 9).as("mmd2"))
      }
      arm("natural", y1).unionByName(arm("shifted", y2)).orderBy("arm")
    }
  )

  // -------------------------------------------------------------------- lof

  private val lof = QueryDef(
    "q_lof",
    "Local Outlier Factor (k = 5) over the embedding corpus — the " +
      "DENSITY-RELATIVE anomaly readout the global detectors miss: " +
      "q_zscore/q_mad_outliers flag globally extreme values and " +
      "q_dbscan labels sparse noise, but a point can sit at a " +
      "perfectly ordinary distance from everything and still be " +
      "anomalous FOR ITS NEIGHBORHOOD — LOF prices exactly that " +
      "(reachability density vs the neighbors' densities; ≈1 = " +
      "inlier). Distances are squared L2 (the bit-exact shared " +
      "kernel; LOF on a squared metric is a well-defined variant and " +
      "keeps the whole chain in the exact domain). Float-order " +
      "discipline: reach-distances and density ratios round to the " +
      "9-grid BEFORE DECIMAL(28,9) summation, so the two engines' " +
      "k-sums cannot diverge by accumulation order. SCALE CONTRACT: " +
      "the exact arm caps at the 1024 smallest vec_ids (TakeOrdered — " +
      "the q_mmd fixed-budget pattern, ≤ 1024² kernel evals forever); " +
      "at 100 TB the kNN stage swaps in the IVF/LSH candidate " +
      "generation the ANN family provides, leaving the LOF algebra " +
      "untouched. Output = top-15 outliers under the total order " +
      "(lof DESC, vec_id).",
    Some {
      val l2 = "list_sum(list_transform(list_zip(a.embedding, b.embedding), " +
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * " +
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
      s"""WITH pts AS (SELECT vec_id, label, embedding FROM embeddings
         |             ORDER BY vec_id LIMIT 1024),
         |d AS (SELECT a.vec_id AS p, b.vec_id AS o, $l2 AS d2
         |      FROM pts a JOIN pts b ON a.vec_id <> b.vec_id),
         |knn AS (SELECT *, row_number() OVER (PARTITION BY p ORDER BY d2, o) AS rn
         |        FROM d),
         |nn AS (SELECT p, o, d2 FROM knn WHERE rn <= 5),
         |kd AS (SELECT p, max(d2) AS kdist FROM nn GROUP BY p),
         |reach AS (SELECT nn.p, nn.o, round(greatest(nn.d2, kdo.kdist), 9) AS r
         |          FROM nn JOIN kd kdo ON kdo.p = nn.o),
         |lrd AS (SELECT p, 5e0 / CAST(sum(CAST(r AS DECIMAL(28,9))) AS DOUBLE) AS lrd
         |        FROM reach GROUP BY p),
         |lof AS (SELECT nn.p,
         |          CAST(sum(CAST(round(lo.lrd / lp.lrd, 9) AS DECIMAL(28,9))) AS DOUBLE)
         |            / 5e0 AS lof
         |        FROM nn JOIN lrd lo ON lo.p = nn.o JOIN lrd lp ON lp.p = nn.p
         |        GROUP BY nn.p)
         |SELECT pts.vec_id, CAST(pts.label AS BIGINT) AS label,
         |       round(lof.lof, 6) AS lof, round(kd.kdist, 6) AS kdist2
         |FROM lof JOIN pts ON pts.vec_id = lof.p JOIN kd ON kd.p = lof.p
         |ORDER BY round(lof.lof, 6) DESC, pts.vec_id LIMIT 15""".stripMargin
    },
    (s, d) => {
      val pts = embeddings(s, d).orderBy("vec_id").limit(1024)
        .select(col("vec_id"), col("label"), col("embedding"))
        .persist() // both join sides + the final label join
      val a = pts.select(col("vec_id").as("p"), col("embedding").as("ea"))
      val b = pts.select(col("vec_id").as("o"), col("embedding").as("eb"))
      val dd = a.join(broadcast(b), col("p") =!= col("o"))
        .select(col("p"), col("o"), l2sq("ea", "eb").as("d2"))
      val w = Window.partitionBy("p").orderBy("d2", "o")
      val nn = dd.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5).select("p", "o", "d2")
        .persist() // three consumers: kdist, reach, lof
      val kd = nn.groupBy("p").agg(max(col("d2")).as("kdist"))
      val reach = nn.join(kd.select(col("p").as("o2"), col("kdist")),
          col("o") === col("o2"))
        .select(col("p"), round(greatest(col("d2"), col("kdist")), 9).as("r"))
      val lrd = reach.groupBy("p")
        .agg((lit(5.0) / dbl(sum(col("r").cast("decimal(28,9)")))).as("lrd"))
      val lofDf = nn
        .join(lrd.select(col("p").as("o3"), col("lrd").as("lrd_o")),
          col("o") === col("o3"))
        .join(lrd.select(col("p").as("p2"), col("lrd").as("lrd_p")),
          col("p") === col("p2"))
        .groupBy("p")
        .agg((dbl(sum(round(col("lrd_o") / col("lrd_p"), 9)
          .cast("decimal(28,9)"))) / lit(5.0)).as("lof"))
      val out = lofDf
        .join(pts, col("p") === col("vec_id"))
        .join(kd.select(col("p").as("p3"), col("kdist")), col("p") === col("p3"))
        .select(col("vec_id"), lng(col("label")).as("label"),
          round(col("lof"), 6).as("lof"), round(col("kdist"), 6).as("kdist2"))
        .orderBy(col("lof").desc, col("vec_id")).limit(15)
      materializeThenRelease(out, pts, nn)
    }
  )

  val defs: Seq[QueryDef] = Seq(topkKnn, knnJoin, vecCentroid, arrayFns,
    vecQuant, embedDrift, coreset, mmd, lof)
}
