package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Recommendation / sequence-compression / graph-mixing operators
  * (SURVEY.md §2.21): item-item collaborative-filtering
  * recommendations, SAX symbolic approximation of the event series,
  * degree assortativity of the trade graph, and per-source
  * distinctive terms (c-TF-IDF).
  *
  * Determinism (SURVEY.md §7.5): all scores are single shared IEEE
  * chains (÷, sqrt, ln) over exact BIGINT counts rounded once; SAX
  * segments are exact integer milli-means and the symbols come from
  * comparisons against interpolated quartiles (percentile ⇔
  * quantile_cont, the q_quantiles precedent); every top-k window has a
  * total-order tiebreak.
  *
  * Scale shapes (PLANS.md): pair generation is order-local (the
  * q_itemsets bound); per-item top-5 windows partition by item and
  * compile to WindowGroupLimit (partial top-k before the exchange);
  * SAX folds bounded per-key series; assortativity is one aggregation
  * over the degree-annotated edge list.
  */
object RecsysQueries {

  // --------------------------------------------------------------- item recs

  private val itemRecs = QueryDef(
    "q_item_recs",
    "Item-item collaborative-filtering recommendations: for every " +
      "part, the top-5 co-purchased parts by cosine-normalized " +
      "co-occurrence (cooc / sqrt(n1·n2) — popularity-corrected, the " +
      "classic neighborhood CF scorer). Pair generation is ORDER-" +
      "LOCAL: per-order distinct part sets collect in one map-side-" +
      "combined shuffle and C(k,2) pairs generate in-task from the " +
      "bounded arrays (no fact self-join); the " +
      "symmetrized pair table joins per-part counts key-partitioned; " +
      "the per-part top-5 is a partitioned window with total-order " +
      "tiebreak, so it compiles to WindowGroupLimit (partial top-5 " +
      "before the exchange) — no global sort at any catalog size.",
    Some("""WITH pr AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
           |              count(DISTINCT a.l_orderkey) AS cooc
           |            FROM lineitem a JOIN lineitem b
           |              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           |            GROUP BY 1, 2),
           |sym AS (SELECT p1 AS p, p2 AS q, cooc FROM pr
           |        UNION ALL SELECT p2, p1, cooc FROM pr),
           |po AS (SELECT l_partkey, count(DISTINCT l_orderkey) AS n FROM lineitem GROUP BY 1),
           |sc AS (SELECT sym.p, sym.q, sym.cooc,
           |         round(CAST(sym.cooc AS DOUBLE) / sqrt(CAST(a.n * b.n AS DOUBLE)), 6) AS score
           |       FROM sym JOIN po a ON sym.p = a.l_partkey
           |                JOIN po b ON sym.q = b.l_partkey),
           |rk AS (SELECT p, q, cooc, score,
           |         row_number() OVER (PARTITION BY p ORDER BY score DESC, q) AS rank
           |       FROM sc)
           |SELECT p, CAST(rank AS BIGINT) AS rank, q, CAST(cooc AS BIGINT) AS cooc, score
           |FROM rk WHERE rank <= 5 ORDER BY p, rank""".stripMargin),
    (s, d) => {
      // collect each order's distinct sorted part set ONCE (one shuffle,
      // map-side combined; per-order sets are bounded), then generate the
      // C(k,2) pairs IN-TASK — no fact self-join, no second exchange
      val baskets = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .persist()
      val pairExpr = expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |            y -> struct(x AS p1, y AS p2))))""".stripMargin)
      val pr = baskets.select(explode(pairExpr).as("pr"))
        .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .agg(count(lit(1)).as("cooc"))
      val sym = pr.select(col("p1").as("p"), col("p2").as("q"), col("cooc"))
        .unionByName(pr.select(col("p2").as("p"), col("p1").as("q"),
          col("cooc")))
      val po = baskets.select(explode(col("ps")).as("l_partkey"))
        .groupBy("l_partkey").agg(count(lit(1)).as("n"))
      val sc = sym
        .join(po.select(col("l_partkey").as("p"), col("n").as("n1")), "p")
        .join(po.select(col("l_partkey").as("q"), col("n").as("n2")), "q")
        .select(col("p"), col("q"), col("cooc"),
          round(dbl(col("cooc")) / sqrt(dbl(col("n1") * col("n2"))), 6)
            .as("score"))
      val w = Window.partitionBy("p").orderBy(col("score").desc, col("q"))
      sc.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("p"), lng(col("rank")).as("rank"), col("q"),
          lng(col("cooc")).as("cooc"), col("score"))
        .orderBy("p", "rank")
    }
  )

  // --------------------------------------------------------------------- sax

  private val sax = QueryDef(
    "q_sax",
    "SAX (symbolic aggregate approximation) of each event type's " +
      "hourly series: 24-hour PAA segments as exact integer milli-" +
      "means ((1000·Σcnt) div hours — engine-exact), quantized " +
      "against the type's own PAA quartiles into a 4-letter alphabet " +
      "and concatenated in segment order — the series→string " +
      "compression that makes motif search a string problem. The " +
      "quartiles come from the TINY per-type PAA table (exact " +
      "interpolated percentile, q_quantiles precedent) broadcast " +
      "back; the string assembles via an ordered fold of the bounded " +
      "per-type segment list.",
    Some("""WITH h AS (SELECT event_type,
           |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
           |         count(*) AS cnt
           |       FROM events GROUP BY 1, 2),
           |paa AS (SELECT event_type, hr // 24 AS seg,
           |          (1000 * sum(cnt)) // count(*) AS v
           |        FROM h GROUP BY 1, 2),
           |qs AS (SELECT event_type,
           |         quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.50) AS q2,
           |         quantile_cont(v, 0.75) AS q3
           |       FROM paa GROUP BY 1),
           |sym AS (SELECT paa.event_type, paa.seg,
           |          CASE WHEN paa.v < qs.q1 THEN 'a' WHEN paa.v < qs.q2 THEN 'b'
           |               WHEN paa.v < qs.q3 THEN 'c' ELSE 'd' END AS s
           |        FROM paa JOIN qs USING (event_type))
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_segments,
           |       string_agg(s, '' ORDER BY seg) AS sax
           |FROM sym GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val h = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("hr"))
        .agg(count(lit(1)).as("cnt"))
      val paa = h.groupBy(col("event_type"), expr("hr DIV 24").as("seg"))
        .agg(expr("(1000 * sum(cnt)) DIV count(*)").as("v"))
      val qs = paa.groupBy("event_type").agg(
        expr("percentile(v, 0.25)").as("q1"),
        expr("percentile(v, 0.50)").as("q2"),
        expr("percentile(v, 0.75)").as("q3"))
      val sym = paa.join(broadcast(qs), "event_type")
        .select(col("event_type"), col("seg"),
          when(col("v") < col("q1"), "a")
            .when(col("v") < col("q2"), "b")
            .when(col("v") < col("q3"), "c")
            .otherwise("d").as("s"))
      sym.groupBy("event_type")
        .agg(lng(count(lit(1))).as("n_segments"),
          array_join(expr(
            "transform(sort_array(collect_list(struct(seg, s))), t -> t.s)"),
            "").as("sax"))
        .orderBy("event_type")
    }
  )

  // ----------------------------------------------------------- assortativity

  private val assortativity = QueryDef(
    "q_assortativity",
    "Degree assortativity of the bipartite trade graph: the Pearson " +
      "correlation between endpoint degrees over every (directed) " +
      "edge — negative values mean hubs attach to leaves, the " +
      "structural fact that decides whether degree-based partitioning " +
      "skews. Degrees are exact integer counts joined onto the edge " +
      "list key-partitioned (twice, once per endpoint); r assembles " +
      "from six exact BIGINT co-moment sums with the shared " +
      "(nΣxy−ΣxΣy)/sqrt(...) chain of q_corr/q_autocorr. One edge-" +
      "list aggregation — no windows, no per-node state.",
    Some("""WITH pairs AS (SELECT DISTINCT o_custkey AS c, 100000 + l_suppkey AS sup
           |               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |e AS (SELECT c AS src, sup AS dst FROM pairs
           |      UNION ALL SELECT sup, c FROM pairs),
           |deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY 1),
           |xy AS (SELECT ds.deg AS x, dd.deg AS y
           |       FROM e JOIN deg ds ON e.src = ds.id JOIN deg dd ON e.dst = dd.id),
           |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           |        sum(x*y) AS sxy, sum(x*x) AS sxx, sum(y*y) AS syy FROM xy)
           |SELECT CAST(n AS BIGINT) AS n_edges,
           |       CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) = 0 THEN NULL
           |            ELSE round(CAST(n*sxy - sx*sy AS DOUBLE)
           |                       / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
           |                              * CAST(n*syy - sy*sy AS DOUBLE)), 6)
           |       END AS assortativity
           |FROM m""".stripMargin),
    (s, d) => {
      val pairs = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 100000L).as("sup"))
        .distinct()
      val e = pairs.select(col("c").as("src"), col("sup").as("dst"))
        .unionByName(pairs.select(col("sup").as("src"), col("c").as("dst")))
      val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
      val xy = e
        .join(deg.select(col("id").as("src"), col("deg").as("x")), "src")
        .join(deg.select(col("id").as("dst"), col("deg").as("y")), "dst")
      // co-moment sums accumulate as DECIMAL(38,0): on a power-law
      // graph, Σdeg² (hub degree² × edge count) can pass 2^63, where
      // BIGINT sums would throw under ANSI while the oracle's DuckDB
      // silently promotes to INT128 — decimal matches the oracle's
      // headroom. The final integer-valued decimal→double casts are
      // bit-identical to DuckDB's hugeint→double (both correctly
      // rounded from the same exact integer; the wide-decimal→double
      // ban applies to FRACTIONAL decimals, verified r7).
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val m = xy.agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
      val d1 = col("n") * col("sxx") - col("sx") * col("sx")
      val d2 = col("n") * col("syy") - col("sy") * col("sy")
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      // zero-variance guard on the factors separately: d1·d2 would
      // overflow even the widened type
      m.select(lng(col("n")).as("n_edges"),
        when(d1 === 0 || d2 === 0, lit(null))
          .otherwise(round(dbl(num) / sqrt(dbl(d1) * dbl(d2)), 6))
          .as("assortativity"))
    }
  )

  // ------------------------------------------------------------ source terms

  private val sourceTerms = QueryDef(
    "q_source_terms",
    "Per-source distinctive terms (c-TF-IDF, the BERTopic class-" +
      "based scorer): tokens aggregated per source, scored tf·idf " +
      "where tf = count/source_tokens and idf = ln(n_sources/df), " +
      "top-5 per source — 'what does this corpus slice talk about'. " +
      "One token aggregation (map-side combined) feeds both the " +
      "per-source totals and the cross-source document frequencies; " +
      "the per-source top-5 is a partitioned WindowGroupLimit window " +
      "with (score desc, token) total order; all scores are one " +
      "shared double chain over exact counts.",
    Some("""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
           |tc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
           |st AS (SELECT source, sum(c) AS tot FROM tc GROUP BY 1),
           |df AS (SELECT w, count(*) AS df FROM tc GROUP BY 1),
           |ns AS (SELECT count(*) AS n FROM st),
           |sc AS (SELECT tc.source, tc.w, tc.c,
           |         round((CAST(tc.c AS DOUBLE) / st.tot)
           |               * ln(CAST(ns.n AS DOUBLE) / df.df), 9) AS score
           |       FROM tc JOIN st USING (source) JOIN df USING (w) CROSS JOIN ns),
           |rk AS (SELECT source, w, c, score,
           |         row_number() OVER (PARTITION BY source ORDER BY score DESC, w) AS rank
           |       FROM sc)
           |SELECT source, CAST(rank AS BIGINT) AS rank, w AS token,
           |       CAST(c AS BIGINT) AS n, score
           |FROM rk WHERE rank <= 5 ORDER BY source, rank""".stripMargin),
    (s, d) => {
      val tc = documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val st = tc.groupBy("source").agg(sum("c").as("tot"))
      val df = tc.groupBy("w").agg(count(lit(1)).as("df"))
      val ns = st.agg(count(lit(1)).as("n"))
      val sc = tc.join(broadcast(st), "source").join(df, "w")
        .crossJoin(broadcast(ns))
        .select(col("source"), col("w"), col("c"),
          round((dbl(col("c")) / col("tot")) * log(dbl(col("n")) / col("df")),
            9).as("score"))
      val w = Window.partitionBy("source").orderBy(col("score").desc, col("w"))
      sc.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("source"), lng(col("rank")).as("rank"),
          col("w").as("token"), lng(col("c")).as("n"), col("score"))
        .orderBy("source", "rank")
    }
  )

  /** Event-type index 1..T shared by the factorization pair. The item
    * dimension is catalog-tiny (a handful of event types), so the
    * index is ONE bounded driver collect (coreset discipline) instead
    * of an unpartitioned row_number window — the single-partition-sort
    * anti-pattern PlanSpec bans repo-wide. Values identical to the
    * oracle's row_number-over-ORDER BY form.
    */
  private def typeIndex(s: org.apache.spark.sql.SparkSession,
                        ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    ev.select("event_type").distinct().orderBy("event_type")
      .as[String].collect()
      .zipWithIndex.map { case (et, i) => (et, (i + 1).toLong) }
      .toSeq.toDF("event_type", "t")
  }

  // ----------------------------------------------------------------- mf step

  /** One matrix-factorization gradient step — the latent-factor model
    * family (ALS/SGD recommenders, the other half of recsys next to
    * the neighborhood method q_item_recs): rank-4 user/item factors
    * over the implicit (user, event_type) count matrix, one full SGD
    * step on every user vector, with the sum-of-squared-errors before
    * and after so the step's effect is auditable.
    *
    * ALL-INTEGER by construction: initial factors are small-integer
    * formulas of (id, k); predictions, residuals and gradient sums are
    * exact BIGINT products; the learning rate 1/1000 is absorbed by
    * carrying updated factors in MILLI-units (u′_milli = 1000·u +
    * Σ e·v — exact), and the after-loss accumulates 1e-6-unit squares
    * as exact BIGINTs. No float exists anywhere in the query, so no
    * accumulation-order or engine surface at all (stricter than the
    * ln-grid queries: nothing to round).
    *
    * Scale: the ONLY data-sized shuffle is the ratings groupBy
    * (map-side combined). Factors are FORMULAS, not tables — the k
    * explode is ×4 on the users×types ratings residue and every
    * reduction keys on user, so the step is one linear pass however
    * large the user base; a real trained-factor variant would swap the
    * formulas for a broadcast item table without changing the plan.
    */
  private val mfStep = QueryDef(
    "q_mf_step",
    "One rank-4 SGD matrix-factorization step over the (user, " +
      "event_type) count matrix: formula-seeded integer factors, " +
      "exact-BIGINT residuals and gradients, updated user vectors in " +
      "milli-units plus SSE before/after — zero float operations.",
    Some("""WITH ti AS (SELECT event_type, CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS t
           |            FROM (SELECT DISTINCT event_type FROM events)),
           |r AS (SELECT e.user_id AS u, ti.t, count(*) AS r
           |      FROM events e JOIN ti USING (event_type) GROUP BY 1, 2),
           |pred AS (SELECT u, t, r,
           |           (SELECT sum(((u * 31 + k * 17) % 7 - 3) * ((t * 13 + k * 3) % 5 - 2))
           |            FROM unnest(generate_series(0, 3)) AS kk(k)) AS p
           |         FROM r),
           |err AS (SELECT u, t, r, r - p AS e FROM pred),
           |upd AS (SELECT err.u, kk.k,
           |          1000 * ((err.u * 31 + kk.k * 17) % 7 - 3)
           |            + sum(err.e * ((err.t * 13 + kk.k * 3) % 5 - 2)) AS um
           |        FROM err, unnest(generate_series(0, 3)) AS kk(k)
           |        GROUP BY err.u, kk.k),
           |pred2 AS (SELECT err.u, err.t, err.r,
           |            sum(upd.um * ((err.t * 13 + upd.k * 3) % 5 - 2)) AS pm
           |          FROM err JOIN upd ON upd.u = err.u
           |          GROUP BY err.u, err.t, err.r),
           |sse AS (SELECT u, sum(e * e) AS sse_before FROM err GROUP BY u),
           |sse2 AS (SELECT u, sum((1000 * r - pm) * (1000 * r - pm)) AS sse_after_e6
           |         FROM pred2 GROUP BY u),
           |uf AS (SELECT u,
           |         sum(CASE WHEN k = 0 THEN um END) AS u0_milli,
           |         sum(CASE WHEN k = 1 THEN um END) AS u1_milli,
           |         sum(CASE WHEN k = 2 THEN um END) AS u2_milli,
           |         sum(CASE WHEN k = 3 THEN um END) AS u3_milli
           |       FROM upd GROUP BY u)
           |SELECT CAST(uf.u AS BIGINT) AS user_id,
           |       CAST(u0_milli AS BIGINT) AS u0_milli,
           |       CAST(u1_milli AS BIGINT) AS u1_milli,
           |       CAST(u2_milli AS BIGINT) AS u2_milli,
           |       CAST(u3_milli AS BIGINT) AS u3_milli,
           |       CAST(sse.sse_before AS BIGINT) AS sse_before,
           |       CAST(sse2.sse_after_e6 AS BIGINT) AS sse_after_e6
           |FROM uf JOIN sse ON sse.u = uf.u JOIN sse2 ON sse2.u = uf.u
           |ORDER BY user_id""".stripMargin),
    (s, d) => {
      val ev = events(s, d).select("user_id", "event_type")
      val ti = typeIndex(s, ev)
      val r = ev.join(broadcast(ti), "event_type")
        .groupBy(col("user_id").as("u"), col("t"))
        .agg(count(lit(1)).as("r"))
      def uf(u: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
        (u * 31 + k * 17) % 7 - 3
      def vf(t: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
        (t * 13 + k * 3) % 5 - 2
      val ks = explode(sequence(lit(0L), lit(3L))).as("k")
      val err = r.select(col("u"), col("t"), col("r"), ks)
        .groupBy("u", "t", "r")
        .agg(sum(uf(col("u"), col("k")) * vf(col("t"), col("k"))).as("p"))
        .withColumn("e", col("r") - col("p"))
        // e feeds the gradient, the before-loss and the after-loss —
        // three consumers of a users×types frame
        .persist()
      val upd = err.select(col("u"), col("t"), col("e"), ks)
        .groupBy("u", "k")
        .agg(sum(col("e") * vf(col("t"), col("k"))).as("g"))
        .withColumn("um", lit(1000) * uf(col("u"), col("k")) + col("g"))
        .select("u", "k", "um")
        .persist()
      val pred2 = err.select(col("u"), col("t"), col("r"))
        .join(upd, "u")
        .groupBy("u", "t", "r")
        .agg(sum(col("um") * vf(col("t"), col("k"))).as("pm"))
      val sseAfter = pred2.groupBy("u")
        .agg(sum((lit(1000) * col("r") - col("pm")) *
          (lit(1000) * col("r") - col("pm"))).as("sse_after_e6"))
      val sseBefore = err.groupBy("u").agg(sum(col("e") * col("e")).as("sse_before"))
      val ufWide = upd.groupBy("u")
        .agg(sum(when(col("k") === 0, col("um"))).as("u0_milli"),
          sum(when(col("k") === 1, col("um"))).as("u1_milli"),
          sum(when(col("k") === 2, col("um"))).as("u2_milli"),
          sum(when(col("k") === 3, col("um"))).as("u3_milli"))
      ufWide.join(sseBefore, "u").join(sseAfter, "u")
        .select(lng(col("u")).as("user_id"),
          lng(col("u0_milli")).as("u0_milli"), lng(col("u1_milli")).as("u1_milli"),
          lng(col("u2_milli")).as("u2_milli"), lng(col("u3_milli")).as("u3_milli"),
          lng(col("sse_before")).as("sse_before"),
          lng(col("sse_after_e6")).as("sse_after_e6"))
        .orderBy("user_id")
    }
  )

  // --------------------------------------------------------------- als solve

  /** One exact ALS half-step — the alternating-least-squares
    * counterpart to [[mfStep]]'s SGD (the two ways production
    * recommenders actually train): with item factors held fixed, each
    * user's optimal rank-2 vector is the ridge normal-equation solve
    * u* = (VᵤᵀVᵤ + λI)⁻¹ Vᵤᵀ rᵤ over that user's rated items. For
    * rank 2 the inverse is closed-form (adjugate over determinant), so
    * the solve stays EXACT RATIONAL: A entries, b entries, det and the
    * adjugate-product numerators are all exact BIGINTs; the only
    * division is the final milli-unit readout (truncating integer
    * division, engine-identical for negative numerators too). λ = 1
    * keeps A positive definite, so det > 0 always.
    *
    * Item factors are the SAME formulas q_mf_step seeds from (k = 0,
    * 1), which makes the SGD-step/ALS-solve comparison a controlled
    * one.
    *
    * Scale: the canonical distributed-ALS inner loop with the linear
    * algebra unrolled — ONE map-side-combined ratings groupBy, then
    * five integer sums per user and a closed-form expression; the
    * item dimension never materializes as a table (a trained variant
    * would broadcast it). Nothing beyond the ratings pass touches
    * data-sized rows.
    */
  private val alsSolve = QueryDef(
    "q_als_solve",
    "Exact rank-2 ridge ALS user solve over the (user, event_type) " +
      "count matrix: per-user normal equations with the 2×2 adjugate " +
      "inverse kept in exact BIGINT rationals (numerators + positive " +
      "determinant), milli-unit factor readout via truncating " +
      "division — zero float operations.",
    Some("""WITH ti AS (SELECT event_type, CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS t
           |            FROM (SELECT DISTINCT event_type FROM events)),
           |r AS (SELECT e.user_id AS u, ti.t, count(*) AS r
           |      FROM events e JOIN ti USING (event_type) GROUP BY 1, 2),
           |sums AS (SELECT u,
           |           1 + sum(((t * 13) % 5 - 2) * ((t * 13) % 5 - 2)) AS a11,
           |           sum(((t * 13) % 5 - 2) * ((t * 13 + 3) % 5 - 2)) AS a12,
           |           1 + sum(((t * 13 + 3) % 5 - 2) * ((t * 13 + 3) % 5 - 2)) AS a22,
           |           sum(r * ((t * 13) % 5 - 2)) AS b0,
           |           sum(r * ((t * 13 + 3) % 5 - 2)) AS b1
           |         FROM r GROUP BY u)
           |SELECT CAST(u AS BIGINT) AS user_id,
           |       CAST(a11 * a22 - a12 * a12 AS BIGINT) AS det,
           |       CAST(a22 * b0 - a12 * b1 AS BIGINT) AS u0_num,
           |       CAST(a11 * b1 - a12 * b0 AS BIGINT) AS u1_num,
           |       CAST((1000 * (a22 * b0 - a12 * b1)) // (a11 * a22 - a12 * a12) AS BIGINT) AS u0_milli,
           |       CAST((1000 * (a11 * b1 - a12 * b0)) // (a11 * a22 - a12 * a12) AS BIGINT) AS u1_milli
           |FROM sums ORDER BY user_id""".stripMargin),
    (s, d) => {
      val ev = events(s, d).select("user_id", "event_type")
      val ti = typeIndex(s, ev)
      val r = ev.join(broadcast(ti), "event_type")
        .groupBy(col("user_id").as("u"), col("t"))
        .agg(count(lit(1)).as("r"))
      // item factor formulas shared with q_mf_step (k = 0 and k = 1)
      val v0 = (col("t") * 13) % 5 - 2
      val v1 = (col("t") * 13 + 3) % 5 - 2
      val sums = r.groupBy("u")
        .agg(sum(v0 * v0).as("s00"), sum(v0 * v1).as("s01"),
          sum(v1 * v1).as("s11"),
          sum(col("r") * v0).as("b0"), sum(col("r") * v1).as("b1"))
        .select(col("u"), (col("s00") + 1).as("a11"), col("s01").as("a12"),
          (col("s11") + 1).as("a22"), col("b0"), col("b1"))
      val det = col("a11") * col("a22") - col("a12") * col("a12")
      val u0n = col("a22") * col("b0") - col("a12") * col("b1")
      val u1n = col("a11") * col("b1") - col("a12") * col("b0")
      sums.select(lng(col("u")).as("user_id"),
          lng(det).as("det"), lng(u0n).as("u0_num"), lng(u1n).as("u1_num"),
          expr("CAST((1000 * (a22 * b0 - a12 * b1)) DIV (a11 * a22 - a12 * a12) AS BIGINT)")
            .as("u0_milli"),
          expr("CAST((1000 * (a11 * b1 - a12 * b0)) DIV (a11 * a22 - a12 * a12) AS BIGINT)")
            .as("u1_milli"))
        .orderBy("user_id")
    }
  )

  /** Weighted Slope One (Lemire & Maclachlan, SDM 2005) — the
    * DEVIATION-based collaborative filter completing the recsys
    * family: [[itemRecs]] ranks by co-occurrence, [[mfStep]]/
    * [[alsSolve]] learn factors; Slope One PREDICTS ratings from
    * per-item-pair average deviations, the classic strong baseline
    * every CF paper compares against.
    *
    * Ratings r(u,i) = total quantity customer u ordered of part i —
    * exact BIGINTs, so the entire model is INTEGER until one final
    * division: dev(j,i) is carried as the RATIONAL (Σ(r_j − r_i), n)
    * and the weighted prediction Σ(sd_ji + r_ui·n_ji) / Σ n_ji
    * divides exact BIGINTs once, round-6; ranking compares the
    * 6-grid with item tie-break.
    *
    * Scale: per-user baskets are CAPPED at the top-30 items by
    * (rating, item) — a user-partitioned window that compiles to
    * WindowGroupLimit — so pair generation is order-local C(30,2)
    * in-task from collected bounded arrays (the itemRecs discipline;
    * an uncapped power-user would otherwise explode quadratically).
    * The deviation table is item-pair-keyed; prediction joins probe
    * users' ratings against it key-partitioned on the rated item;
    * the top-3 window partitions by user. Probe set = custkey % 97
    * = 0 (~1%), applied BEFORE the prediction join.
    */
  private val slopeOne = QueryDef(
    "q_slope_one",
    "Weighted Slope One recommendations: per-item-pair rating " +
      "deviations carried as exact integer rationals over top-30 " +
      "capped per-customer baskets (order-local pair generation), " +
      "weighted predictions for the 1% probe customers' unrated " +
      "items via ONE final division, top-3 per customer.",
    Some("""WITH r AS (SELECT o.o_custkey AS u, l.l_partkey AS i,
           |                  CAST(sum(l.l_quantity) AS BIGINT) AS rt
           |           FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
           |           GROUP BY 1, 2),
           |rb AS (SELECT u, i, rt FROM (
           |         SELECT u, i, rt,
           |                row_number() OVER (PARTITION BY u ORDER BY rt DESC, i) AS rn
           |         FROM r) WHERE rn <= 30),
           |dev AS (SELECT a.i AS i, b.i AS j, sum(a.rt - b.rt) AS sd, count(*) AS n
           |        FROM rb a JOIN rb b ON a.u = b.u AND a.i <> b.i
           |        GROUP BY 1, 2),
           |pred AS (SELECT rb.u, d.i AS j,
           |                sum(d.sd + rb.rt * d.n) AS num, sum(d.n) AS den
           |         FROM rb JOIN dev d ON d.j = rb.i
           |         WHERE rb.u % 97 = 0
           |         GROUP BY 1, 2),
           |unr AS (SELECT p.u, p.j, p.num, p.den FROM pred p
           |        LEFT JOIN rb x ON x.u = p.u AND x.i = p.j
           |        WHERE x.i IS NULL),
           |fin AS (SELECT u, j, round(CAST(num AS DOUBLE) / den, 6) AS pred FROM unr),
           |rk AS (SELECT u, j, pred,
           |              row_number() OVER (PARTITION BY u ORDER BY pred DESC, j) AS rn
           |       FROM fin)
           |SELECT u, CAST(rn AS BIGINT) AS rank, j, pred
           |FROM rk WHERE rn <= 3 ORDER BY u, rank""".stripMargin),
    (s, d) => {
      val r = lineitem(s, d).select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
        .agg(lng(sum(col("l_quantity"))).as("rt"))
      val wTop = Window.partitionBy("u").orderBy(col("rt").desc, col("i"))
      val rb = r.withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 30).drop("rn")
        .persist()
      // order-local pair generation from the bounded per-user basket
      // (the itemRecs discipline — no fact self-join): both directions
      // in one pass, deviation carried as the exact rational (sd, n).
      // The pair loop is a tight mapPartitions integer loop, NOT a
      // nested transform/filter HOF — higher-order array functions
      // have no doGenCode and interpret per element (the q_unigram_lm
      // r8e measurement: 10.9 → 1.0 s for exactly this rewrite), and
      // this O(basket²) stage is the query's hot spot (VERDICT r11 #3)
      import s.implicits._
      val baskets = rb.groupBy("u")
        .agg(collect_list(struct(col("i").as("_1"), col("rt").as("_2"))).as("ps"))
      // antisymmetry cuts the shuffle in half: emit only i < j pairs,
      // aggregate, then mirror (sd(j,i) = −sd(i,j), same n) on the
      // already-reduced pair table
      val devHalf = baskets.select(col("ps")).as[Seq[(Long, Long)]]
        .mapPartitions { it =>
          it.flatMap { ps =>
            val n = ps.size
            val ids = new Array[Long](n)
            val rts = new Array[Long](n)
            var x = 0
            ps.foreach { p => ids(x) = p._1; rts(x) = p._2; x += 1 }
            val out = new Array[(Long, Long, Long)](n * (n - 1) / 2)
            var k = 0
            var a = 0
            while (a < n) {
              var b = a + 1
              while (b < n) {
                if (ids(a) < ids(b)) out(k) = (ids(a), ids(b), rts(a) - rts(b))
                else out(k) = (ids(b), ids(a), rts(b) - rts(a))
                k += 1
                b += 1
              }
              a += 1
            }
            out
          }
        }
        .toDF("di", "dj", "df")
        .groupBy("di", "dj")
        .agg(sum(col("df")).as("sd"), count(lit(1)).as("n"))
        .persist()
      val dev = devHalf.unionAll(devHalf.select(col("dj").as("di"),
        col("di").as("dj"), (-col("sd")).as("sd"), col("n")))
      val probe = rb.filter(col("u") % 97 === 0)
      val wRank = Window.partitionBy("u").orderBy(col("pred").desc, col("j"))
      // probe = 1% of users × ≤30 items — broadcast it so the
      // pair-sized deviation table never crosses an exchange
      broadcast(probe).join(dev, probe("i") === dev("dj"))
        .groupBy(col("u"), col("di").as("j"))
        .agg(sum(col("sd") + col("rt") * col("n")).as("num"), sum(col("n")).as("den"))
        .join(rb.select(col("u"), col("i").as("j")), Seq("u", "j"), "left_anti")
        .select(col("u"), col("j"), round(dbl(col("num")) / col("den"), 6).as("pred"))
        .withColumn("rn", row_number().over(wRank))
        .filter(col("rn") <= 3)
        .select(col("u"), lng(col("rn")).as("rank"), col("j"), col("pred"))
        .transform(materializeThenRelease(_, rb, devHalf))
        .orderBy("u", "rank")
    }
  )

  /** Deterministic negative sampling — the TRAINING-DATA complement
    * to the recommenders the family already fits (q_item_recs /
    * q_mf_step / q_als_solve / q_slope_one all consume positives;
    * implicit-feedback training needs NEGATIVES too, and uniform
    * hash-sampling with an interaction anti-join is the standard
    * generator): per probe customer (the shared 1% probe set), 8
    * hash-derived candidate parts, minus the parts the customer
    * actually ordered, first 3 by slot — the (user, negative item)
    * rows a BPR/ALS trainer pairs against the positives.
    *
    * Determinism: candidates are a pure hash of (user, slot) modulo
    * the exact part count (one scalar broadcast); duplicate candidate
    * items collapse to their min slot before ranking; the final rank
    * orders by (slot, item) — no randomness anywhere, same rows on
    * every run and engine.
    *
    * Scale: probes × 8 candidate rows (tiny) anti-joined key-
    * partitioned against the user's interactions; the interaction
    * table is the only fact-sized input and it is touched once.
    */
  private val negativeSampling = QueryDef(
    "q_negative_sampling",
    "Deterministic hash-based negative sampling for implicit-feedback " +
      "training: per probe customer, 8 hash candidates minus the " +
      "anti-joined true interactions, first 3 negatives by slot.",
    Some("""WITH inter AS (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i
           |               FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
           |np AS (SELECT max(p_partkey) AS np FROM part),
           |probes AS (SELECT DISTINCT u FROM inter WHERE u % 97 = 0),
           |cand AS (SELECT p.u, s.slot,
           |                1 + ((p.u % 1000003) * 2654435761 + s.slot * 40503) % np.np AS item
           |         FROM probes p CROSS JOIN np
           |         CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS slot) s),
           |neg AS (SELECT c.u, c.item, min(c.slot) AS slot
           |        FROM cand c LEFT JOIN inter x ON x.u = c.u AND x.i = c.item
           |        WHERE x.i IS NULL GROUP BY 1, 2),
           |rk AS (SELECT u, item, slot,
           |              row_number() OVER (PARTITION BY u ORDER BY slot, item) AS rn
           |       FROM neg)
           |SELECT u, CAST(rn AS BIGINT) AS rank, item, CAST(slot AS BIGINT) AS slot
           |FROM rk WHERE rn <= 3 ORDER BY u, rank""".stripMargin),
    (s, d) => {
      val inter = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
        .distinct()
      val np = part(s, d).agg(max(col("p_partkey")).as("np"))
      val probes = inter.filter(col("u") % 97 === 0).select("u").distinct()
      val slots = s.range(8).select(col("id").as("slot"))
      val cand = probes.crossJoin(broadcast(np))
        .crossJoin(broadcast(slots))
        .select(col("u"), col("slot"),
          // u reduced mod the fixed prime 1000003 BEFORE the Knuth
          // multiply (ADVICE r12): identical to the unreduced hash for
          // every u < 1000003 (all tested SFs), and the product is now
          // bounded at ~2.65e15 — no BIGINT wrap at any customer key
          (lit(1L) + ((col("u") % 1000003L) * 2654435761L
            + col("slot") * 40503L) % col("np")).as("item"))
      val w = Window.partitionBy("u").orderBy(col("slot"), col("item"))
      cand.join(inter.select(col("u"), col("i").as("item")),
          Seq("u", "item"), "left_anti")
        .groupBy("u", "item")
        .agg(min(col("slot")).as("slot"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("u"), lng(col("rn")).as("rank"), col("item"),
          lng(col("slot")).as("slot"))
        .orderBy("u", "rank")
    }
  )

  val defs: Seq[QueryDef] = Seq(itemRecs, sax, assortativity, sourceTerms,
    mfStep, alsSolve, slopeOne, negativeSampling)
}
