package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables._
import graft.util.Det._

/** Data-mining / experimentation operators (SURVEY.md §2.18): Shannon
  * entropy, Benford first-digit screening, cohort retention matrix,
  * co-purchase Jaccard similarity, unigram cross-entropy scoring, a
  * day-of-week × hour seasonality profile, a two-proportion A/B
  * z-test, one k-means Lloyd assignment step, and a customer survival
  * curve.
  *
  * Determinism (SURVEY.md §7.5): every float statistic is either (a) a
  * single shared IEEE chain applied once to exact integer aggregates
  * (divisions, sqrt, log — identical text in both engines), or (b) a
  * per-row contribution rounded to a fixed decimal scale and summed
  * exactly as DECIMAL, so no cross-engine float-accumulation-order
  * dependence survives. All derived integers are BIGINT.
  *
  * Scale shapes (PLANS.md): every query aggregates the fact FIRST and
  * runs the interesting math on tiny (≤ thousands of rows) aggregate
  * tables — entropy cells, digit histograms, cohort matrices, nation
  * pairs, cluster rows — joined back by broadcast where a fact pass
  * needs them. No window ever sees a single global partition.
  */
object MiningQueries {

  // ---------------------------------------------------------------- entropy

  private val entropy = QueryDef(
    "q_entropy",
    "Shannon entropy (bits) of the event-type distribution per user " +
      "cohort (user_id mod 8) — the class-balance diagnostic run " +
      "before sampling training data from a log. One fact aggregation " +
      "to ≤ 8×5 cells; cohort totals are a tiny broadcast join; each " +
      "cell's −p·log2(p) is rounded to 9 decimals and summed as exact " +
      "DECIMAL so the entropy does not depend on float addition order. " +
      "p = c/n is a single double division of two exact BIGINTs.",
    Some("""WITH cells AS (SELECT user_id % 8 AS cohort, event_type, count(*) AS c
           |               FROM events GROUP BY 1, 2),
           |tot AS (SELECT cohort, sum(c) AS n FROM cells GROUP BY 1)
           |SELECT CAST(cells.cohort AS BIGINT) AS cohort,
           |       CAST(tot.n AS BIGINT) AS n_events,
           |       CAST(count(*) AS BIGINT) AS n_types,
           |       round(CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n), 9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy_bits
           |FROM cells JOIN tot USING (cohort)
           |GROUP BY cells.cohort, tot.n
           |ORDER BY cohort""".stripMargin),
    (s, d) => {
      val cells = events(s, d)
        .groupBy((col("user_id") % 8).as("cohort"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val tot = cells.groupBy("cohort").agg(sum("c").as("n"))
      val contrib = round(-(dbl(col("c")) / col("n")) *
          log2(dbl(col("c")) / col("n")), 9)
        .cast(DecimalType(18, 9))
      cells.join(broadcast(tot), "cohort")
        .groupBy(col("cohort"), col("n"))
        .agg(lng(count(lit(1))).as("n_types"),
          round(dbl(sum(contrib)), 6).as("entropy_bits"))
        .select(lng(col("cohort")).as("cohort"), lng(col("n")).as("n_events"),
          col("n_types"), col("entropy_bits"))
        .orderBy("cohort")
    }
  )

  // ---------------------------------------------------------------- benford

  private val benford = QueryDef(
    "q_benford",
    "Benford's-law first-digit screen over o_totalprice — the fraud / " +
      "synthetic-data smell test: observed share of each leading digit " +
      "vs the Benford expectation log10(1 + 1/d). The digit is " +
      "extracted from the DECIMAL(18,2) string rendering (both engines " +
      "render the same decimal identically; float→string would " +
      "diverge), so the whole histogram is exact integer counting; the " +
      "two shares are single double divisions / one log10 chain " +
      "rounded at the end. One fact aggregation to ≤ 9 rows; the " +
      "total rides a broadcast.",
    Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS BIGINT) AS digit
           |           FROM orders WHERE o_totalprice >= 1),
           |t AS (SELECT count(*) AS total FROM d)
           |SELECT digit, CAST(count(*) AS BIGINT) AS n,
           |       round(CAST(count(*) AS DOUBLE) / t.total, 6) AS share_obs,
           |       round(log10(1 + CAST(1 AS DOUBLE) / digit), 6) AS share_benford
           |FROM d, t GROUP BY digit, t.total ORDER BY digit""".stripMargin),
    (s, d) => {
      val digits = orders(s, d)
        .filter(col("o_totalprice") >= 1)
        .select(substring(money(col("o_totalprice")).cast("string"), 1, 1)
          .cast("long").as("digit"))
      val t = digits.agg(count(lit(1)).as("total"))
      digits.groupBy("digit").agg(lng(count(lit(1))).as("n"))
        .crossJoin(broadcast(t))
        .select(col("digit"), col("n"),
          round(dbl(col("n")) / col("total"), 6).as("share_obs"),
          round(log10(lit(1) + dbl(lit(1)) / col("digit")), 6)
            .as("share_benford"))
        .orderBy("digit")
    }
  )

  // ----------------------------------------------------------- cohort matrix

  private val cohortMatrix = QueryDef(
    "q_cohort_matrix",
    "Cohort retention matrix: customers grouped by first-order month " +
      "(the cohort), counted as active in each month-offset since — " +
      "the standard triangular retention table. Month arithmetic is " +
      "exact integers (year·12+month), so no cross-engine date-diff " +
      "semantics are involved. Shape: one orders aggregation for the " +
      "per-customer first month, joined back on o_custkey (both sides " +
      "hash-partition on the same key — at 100 TB the exchange from " +
      "the min() aggregate is reusable), then one aggregation to the " +
      "≤ months² matrix.",
    Some("""WITH f AS (SELECT o_custkey, min(o_orderdate) AS fd FROM orders GROUP BY 1)
           |SELECT strftime(f.fd, '%Y-%m') AS cohort,
           |       CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate))
           |            - (year(f.fd) * 12 + month(f.fd)) AS BIGINT) AS month_offset,
           |       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active
           |FROM orders o JOIN f USING (o_custkey)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val o = orders(s, d).select(col("o_custkey"), col("o_orderdate"))
      val f = o.groupBy("o_custkey").agg(min("o_orderdate").as("fd"))
      o.join(f, "o_custkey")
        .groupBy(date_format(col("fd"), "yyyy-MM").as("cohort"),
          lng((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
            (year(col("fd")) * 12 + month(col("fd")))).as("month_offset"))
        .agg(lng(countDistinct(col("o_custkey"))).as("n_active"))
        .orderBy("cohort", "month_offset")
    }
  )

  // ------------------------------------------------------------- copurchase

  private val copurchase = QueryDef(
    "q_copurchase",
    "Co-purchase Jaccard similarity between nations: |parts bought by " +
      "both| / |parts bought by either| for every nation pair — the " +
      "item-based collaborative-similarity shape. The fact is reduced " +
      "to DISTINCT (nation, part) ONCE; the pair generation self-joins " +
      "that reduced set on partkey, so each part contributes at most " +
      "C(25,2) pairs regardless of its sales volume (the naive " +
      "basket×basket join would be quadratic in part popularity). Set " +
      "sizes are a ≤ 25-row broadcast; Jaccard is one double division " +
      "of exact BIGINTs.",
    Some("""WITH np AS (SELECT DISTINCT n.n_name AS nat, l.l_partkey AS p
           |            FROM lineitem l
           |            JOIN orders o ON l.l_orderkey = o.o_orderkey
           |            JOIN customer c ON o.o_custkey = c.c_custkey
           |            JOIN nation n ON c.c_nationkey = n.n_nationkey),
           |sz AS (SELECT nat, count(*) AS s FROM np GROUP BY 1),
           |x AS (SELECT a.nat AS nat_a, b.nat AS nat_b, count(*) AS i
           |      FROM np a JOIN np b ON a.p = b.p AND a.nat < b.nat
           |      GROUP BY 1, 2)
           |SELECT nat_a, nat_b, CAST(i AS BIGINT) AS n_common,
           |       round(CAST(i AS DOUBLE) / (sa.s + sb.s - i), 6) AS jaccard
           |FROM x JOIN sz sa ON sa.nat = x.nat_a
           |       JOIN sz sb ON sb.nat = x.nat_b
           |ORDER BY nat_a, nat_b""".stripMargin),
    (s, d) => {
      val np = lineitem(s, d).select("l_orderkey", "l_partkey")
        .join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nat"), col("l_partkey").as("p"))
        .distinct()
      val sz = np.groupBy("nat").agg(count(lit(1)).as("s"))
      val x = np.as("a").join(np.as("b"),
          col("a.p") === col("b.p") && col("a.nat") < col("b.nat"))
        .groupBy(col("a.nat").as("nat_a"), col("b.nat").as("nat_b"))
        .agg(count(lit(1)).as("i"))
      x.join(broadcast(sz.withColumnRenamed("nat", "nat_a")
          .withColumnRenamed("s", "sa")), "nat_a")
        .join(broadcast(sz.withColumnRenamed("nat", "nat_b")
          .withColumnRenamed("s", "sb")), "nat_b")
        .select(col("nat_a"), col("nat_b"), lng(col("i")).as("n_common"),
          round(dbl(col("i")) / (col("sa") + col("sb") - col("i")), 6)
            .as("jaccard"))
        .orderBy("nat_a", "nat_b")
    }
  )

  // --------------------------------------------------------------- xentropy

  private val xentropy = QueryDef(
    "q_xentropy",
    "Unigram cross-entropy of each document against the corpus " +
      "language model — the cheap perplexity proxy used to rank " +
      "documents for LM-training quality (low = repetitive/common, " +
      "high = rare-token-heavy). The corpus unigram table is built " +
      "with ONE token aggregation (map-side combined); each token " +
      "occurrence then scores −log2 p = log2(T/c) against it via a " +
      "key-partitioned join, rounded to 9 decimals and summed as " +
      "exact DECIMAL per doc, so the per-doc mean is independent of " +
      "float order. At 100 TB the vocab join stays a hash join on the " +
      "token key (the vocab is zipfian-small relative to the corpus).",
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
           |v AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
           |t AS (SELECT sum(c) AS total FROM v)
           |SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |       round(CAST(sum(CAST(round(log2(CAST(t.total AS DOUBLE) / CAST(v.c AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS xent_bits
           |FROM tok JOIN v USING (w) CROSS JOIN t
           |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin),
    (s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val v = tok.groupBy("w").agg(count(lit(1)).as("c"))
      val t = v.agg(sum("c").as("total"))
      val contrib = round(log2(dbl(col("total")) / dbl(col("c"))), 9)
        .cast(DecimalType(18, 9))
      tok.join(v, "w").crossJoin(broadcast(t))
        .groupBy("doc_id")
        .agg(lng(count(lit(1))).as("n_tokens"),
          round(dbl(sum(contrib)) / count(lit(1)), 6).as("xent_bits"))
        .orderBy("doc_id")
    }
  )

  // ------------------------------------------------------------ seasonality

  private val seasonality = QueryDef(
    "q_seasonality",
    "Day-of-week × hour-of-day activity profile of the event stream, " +
      "with each cell's share of total traffic and share within its " +
      "day — the load-shape query behind batch-window placement. Both " +
      "coordinates are exact integer arithmetic on epoch microseconds " +
      "(dow via (epoch_day + 4) mod 7, Sunday = 0 — no engine dow() " +
      "convention involved); counts are exact; shares are single " +
      "double divisions. One fact aggregation to ≤ 168 cells, then " +
      "tiny broadcast joins for the two denominators.",
    Some("""WITH cell AS (SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow,
           |                     (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hod,
           |                     count(*) AS n
           |              FROM events GROUP BY 1, 2),
           |t AS (SELECT sum(n) AS total FROM cell),
           |dw AS (SELECT dow, sum(n) AS dtot FROM cell GROUP BY 1)
           |SELECT CAST(cell.dow AS BIGINT) AS dow, CAST(cell.hod AS BIGINT) AS hod,
           |       CAST(cell.n AS BIGINT) AS n,
           |       round(CAST(cell.n AS DOUBLE) / t.total, 6) AS share_total,
           |       round(CAST(cell.n AS DOUBLE) / dw.dtot, 6) AS share_dow
           |FROM cell JOIN dw USING (dow) CROSS JOIN t
           |ORDER BY dow, hod""".stripMargin),
    (s, d) => {
      val us = unix_micros(col("ts"))
      val cell = events(s, d)
        .groupBy(((us / 86400000000L).cast("long") + 4) % 7 as "dow",
          (us / 3600000000L).cast("long") % 24 as "hod")
        .agg(count(lit(1)).as("n"))
      val t = cell.agg(sum("n").as("total"))
      val dw = cell.groupBy("dow").agg(sum("n").as("dtot"))
      cell.join(broadcast(dw), "dow").crossJoin(broadcast(t))
        .select(lng(col("dow")).as("dow"), lng(col("hod")).as("hod"),
          lng(col("n")).as("n"),
          round(dbl(col("n")) / col("total"), 6).as("share_total"),
          round(dbl(col("n")) / col("dtot"), 6).as("share_dow"))
        .orderBy("dow", "hod")
    }
  )

  // ----------------------------------------------------------------- abtest

  private val abtest = QueryDef(
    "q_abtest",
    "Two-proportion z-test on a deterministic 50/50 user split " +
      "(user_id mod 2): purchase-event rate per arm and the pooled z " +
      "statistic — the experiment readout. The entire fact collapses " +
      "in one aggregation to two rows; the z chain (pooled rate, " +
      "variance, sqrt, one division) is written with identical " +
      "operation order in both engines over exact BIGINT counts, so " +
      "the rounded statistic matches bit-for-bit.",
    Some("""WITH g AS (SELECT user_id % 2 AS grp, count(*) AS n,
           |                  count(*) FILTER (WHERE event_type = 'purchase') AS conv
           |           FROM events GROUP BY 1)
           |SELECT CAST(a.n AS BIGINT) AS n_a, CAST(a.conv AS BIGINT) AS conv_a,
           |       CAST(b.n AS BIGINT) AS n_b, CAST(b.conv AS BIGINT) AS conv_b,
           |       round(CAST(a.conv AS DOUBLE) / a.n, 6) AS rate_a,
           |       round(CAST(b.conv AS DOUBLE) / b.n, 6) AS rate_b,
           |       round((CAST(a.conv AS DOUBLE) / a.n - CAST(b.conv AS DOUBLE) / b.n)
           |             / sqrt((CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n))
           |                    * (1 - CAST(a.conv + b.conv AS DOUBLE) / (a.n + b.n))
           |                    * (CAST(1 AS DOUBLE) / a.n + CAST(1 AS DOUBLE) / b.n)), 6) AS z
           |FROM g a, g b WHERE a.grp = 0 AND b.grp = 1""".stripMargin),
    (s, d) => {
      val g = events(s, d)
        .groupBy((col("user_id") % 2).as("grp"))
        .agg(count(lit(1)).as("n"),
          count(when(col("event_type") === "purchase", 1)).as("conv"))
      val a = g.filter(col("grp") === 0)
        .select(col("n").as("n_a"), col("conv").as("conv_a"))
      val b = g.filter(col("grp") === 1)
        .select(col("n").as("n_b"), col("conv").as("conv_b"))
      a.crossJoin(b).selectExpr(
        "CAST(n_a AS BIGINT) AS n_a", "CAST(conv_a AS BIGINT) AS conv_a",
        "CAST(n_b AS BIGINT) AS n_b", "CAST(conv_b AS BIGINT) AS conv_b",
        "round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a",
        "round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b",
        """round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
          | / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
          |        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
          |        * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 6) AS z"""
          .stripMargin)
    }
  )

  // ----------------------------------------------------------------- kmeans

  private val kmeans = QueryDef(
    "q_kmeans",
    "One k-means Lloyd assignment step over the embedding corpus: " +
      "vectors vec_id < 8 serve as the deterministic initial " +
      "centroids; every vector is assigned to its nearest centroid by " +
      "squared L2 (exact double sequential fold — the q_knn_join " +
      "discipline; ties break to the lowest centroid id), and each " +
      "cluster reports its size and mean squared distance (per-row " +
      "distance rounded to 9 decimals, summed as exact DECIMAL). " +
      "Shape: 8 centroids broadcast to the corpus scan, per-vector " +
      "argmin via a vec_id-partitioned window over 8 candidates, one " +
      "aggregation to 8 rows — no shuffle ever carries the raw " +
      "vectors twice.",
    Some("""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8),
           |d AS (SELECT e.vec_id, c.cid,
           |        list_sum(list_transform(list_zip(e.embedding, c.cvec),
           |          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS d2
           |      FROM embeddings e CROSS JOIN c),
           |a AS (SELECT vec_id, cid, d2,
           |        row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
           |      FROM d)
           |SELECT CAST(cid AS BIGINT) AS cluster_id,
           |       CAST(count(*) AS BIGINT) AS n_members,
           |       round(CAST(sum(CAST(round(d2, 9) AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6) AS mean_d2
           |FROM a WHERE rn = 1 GROUP BY cid ORDER BY cluster_id""".stripMargin),
    (s, d) => {
      val e = embeddings(s, d)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val cand = e.select("vec_id", "embedding")
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          l2sq("embedding", "cvec").as("d2"))
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy("cid")
        .agg(lng(count(lit(1))).as("n_members"),
          round(dbl(sum(round(col("d2"), 9).cast(DecimalType(28, 9)))) /
            count(lit(1)), 6).as("mean_d2"))
        .select(lng(col("cid")).as("cluster_id"), col("n_members"),
          col("mean_d2"))
        .orderBy("cluster_id")
    }
  )

  // --------------------------------------------------------------- survival

  private val survival = QueryDef(
    "q_survival",
    "Customer survival curve: share of customers whose first-to-last " +
      "order lifetime spans at least m months, for every observed m — " +
      "the churn half-life readout. Lifetime is exact integer month " +
      "arithmetic from one orders aggregation; the curve is a theta " +
      "self-join of the TINY lifetime histogram (cumulative-from-" +
      "above as sum over b.m >= a.m), so the fact is scanned once and " +
      "nothing quadratic touches per-customer rows; the share is one " +
      "double division.",
    Some("""WITH ym AS (SELECT o_custkey, year(o_orderdate) * 12 + month(o_orderdate) AS ym FROM orders),
           |lt AS (SELECT o_custkey, max(ym) - min(ym) AS m FROM ym GROUP BY 1),
           |tot AS (SELECT count(*) AS total FROM lt),
           |d AS (SELECT m, count(*) AS c FROM lt GROUP BY 1)
           |SELECT CAST(a.m AS BIGINT) AS months,
           |       CAST(sum(b.c) AS BIGINT) AS n_surviving,
           |       round(CAST(sum(b.c) AS DOUBLE) / tot.total, 6) AS share
           |FROM d a JOIN d b ON b.m >= a.m CROSS JOIN tot
           |GROUP BY a.m, tot.total ORDER BY months""".stripMargin),
    (s, d) => {
      val lt = orders(s, d)
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"))
        .groupBy("o_custkey")
        .agg((max("ym") - min("ym")).as("m"))
      val tot = lt.agg(count(lit(1)).as("total"))
      val dist = lt.groupBy("m").agg(count(lit(1)).as("c"))
      dist.as("a")
        .join(broadcast(dist.as("b")), col("b.m") >= col("a.m"))
        .crossJoin(broadcast(tot))
        .groupBy(col("a.m"), col("total"))
        .agg(sum(col("b.c")).as("ns"))
        .select(lng(col("m")).as("months"), lng(col("ns")).as("n_surviving"),
          round(dbl(col("ns")) / col("total"), 6).as("share"))
        .orderBy("months")
    }
  )

  // ----------------------------------------------------------------- dbscan

  /** DBSCAN density clustering (Ester et al. 1996) over the 2-D
    * embedding projection — the complement to q_kmeans: finds
    * arbitrary-shaped dense regions and, critically for corpus work,
    * an explicit NOISE class (k-means force-assigns every outlier to
    * some centroid; density clustering is what actually separates
    * "off-distribution junk" from "small coherent mode").
    *
    * Scale: the textbook algorithm is a sequential region-growing
    * scan — inexpressible distributedly. The standard rewrite
    * (MR-DBSCAN) is what's built here: (1) quantize points to
    * eps-sized grid cells, so candidate neighbors live in the 3×3
    * cell neighborhood — an equi-join on cell keys (shuffle
    * co-locates cells; candidates per point are bounded by local
    * density, never O(N)); (2) core points = neighbor-count ≥ minPts,
    * a map-side-combined aggregate; (3) clusters = connected
    * components over core-core eps-edges via the pointer-doubling CC
    * op (O(log diameter) rounds); (4) border points attach to their
    * minimum core neighbor's cluster; the rest is noise.
    *
    * Determinism: coordinates widen float→double identically in both
    * engines; cell ids are floor(x·20) over identical doubles; the
    * eps test compares identically-ordered IEEE products; cluster id
    * = minimum core vec_id of the component (CC's fixpoint label —
    * order- and partitioning-independent); border ties resolve by
    * MIN cluster id. The oracle replays CC as a recursive min-label
    * CTE — closure-sized, fine at oracle scale (sf0.01); the Spark
    * side stays O(log diameter) for the 100 TB path.
    */
  private val dbscan = QueryDef(
    "q_dbscan",
    "Grid-bucketed DBSCAN (eps=0.032, minPts=5) over embedding dims " +
      "1-2: 3x3 cell-neighborhood candidate join, core/border/noise " +
      "roles, clusters = pointer-doubling CC over core-core edges " +
      "(oracle replays CC as a recursive min-label CTE).",
    Some("""WITH RECURSIVE pts AS (
           |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y FROM embeddings),
           |c AS (SELECT *, CAST(floor(x * 31.25) AS BIGINT) AS cx, CAST(floor(y * 31.25) AS BIGINT) AS cy FROM pts),
           |nbr AS (
           |  SELECT a.vec_id AS ai, b.vec_id AS bi
           |  FROM c a JOIN c b
           |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
           |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 0.001024),
           |deg AS (SELECT ai AS vec_id, CAST(count(*) AS BIGINT) AS n_nbr FROM nbr GROUP BY 1),
           |core AS (SELECT vec_id FROM deg WHERE n_nbr >= 5),
           |ce AS (SELECT n.ai, n.bi FROM nbr n
           |       JOIN core c1 ON n.ai = c1.vec_id JOIN core c2 ON n.bi = c2.vec_id
           |       WHERE n.ai <> n.bi),
           |r(node, lbl) AS (
           |  SELECT vec_id, vec_id FROM core
           |  UNION
           |  SELECT ce.bi, r.lbl FROM r JOIN ce ON ce.ai = r.node),
           |comp AS (SELECT node, min(lbl) AS lbl FROM r GROUP BY node),
           |border AS (
           |  SELECT n.ai AS vec_id, min(comp.lbl) AS blbl
           |  FROM nbr n JOIN comp ON n.bi = comp.node
           |  WHERE n.ai <> n.bi AND n.ai NOT IN (SELECT vec_id FROM core)
           |  GROUP BY n.ai)
           |SELECT p.vec_id, deg.n_nbr,
           |       CASE WHEN comp.lbl IS NOT NULL THEN 'core'
           |            WHEN border.blbl IS NOT NULL THEN 'border'
           |            ELSE 'noise' END AS role,
           |       coalesce(comp.lbl, border.blbl, -1) AS cluster
           |FROM pts p
           |JOIN deg ON p.vec_id = deg.vec_id
           |LEFT JOIN comp ON p.vec_id = comp.node
           |LEFT JOIN border ON p.vec_id = border.vec_id
           |ORDER BY p.vec_id""".stripMargin),
    (s, d) => {
      val cells = embeddings(s, d)
        .select(col("vec_id"),
          dbl(element_at(col("embedding"), 1)).as("x"),
          dbl(element_at(col("embedding"), 2)).as("y"))
        .withColumn("cx", lng(floor(col("x") * 31.25)))
        .withColumn("cy", lng(floor(col("y") * 31.25)))
      val a = cells.select(col("vec_id").as("ai"), col("x").as("ax"),
        col("y").as("ay"), col("cx"), col("cy"))
        .withColumn("o", explode(expr(
          "transform(sequence(0, 8), i -> struct(i div 3 - 1 AS dx, i % 3 - 1 AS dy))")))
        .select(col("ai"), col("ax"), col("ay"),
          (col("cx") + col("o.dx")).as("kx"), (col("cy") + col("o.dy")).as("ky"))
      val b = cells.select(col("vec_id").as("bi"), col("x").as("bx"),
        col("y").as("by"), col("cx").as("kx"), col("cy").as("ky"))
      val nbr = a.join(b, Seq("kx", "ky"))
        .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")) <= 0.001024)
        .select("ai", "bi").persist()
      val deg = nbr.groupBy(col("ai").as("vec_id"))
        .agg(lng(count(lit(1))).as("n_nbr")).persist()
      val core = deg.filter(col("n_nbr") >= 5).select("vec_id")
      val coreEdges = nbr
        .join(core.withColumnRenamed("vec_id", "ai"), Seq("ai"), "left_semi")
        .join(core.withColumnRenamed("vec_id", "bi"), Seq("bi"), "left_semi")
        .filter(col("ai") =!= col("bi"))
        .select(col("ai").as("ea"), col("bi").as("eb"))
      val (labels, _) = graft.ops.ConnectedComponents.run(
        core.select(col("vec_id").as("node")), coreEdges)
      val comp = labels.select(col("node"), col("label").as("lbl"))
      val borderLbl = nbr.filter(col("ai") =!= col("bi"))
        .join(core.withColumnRenamed("vec_id", "ai"), Seq("ai"), "left_anti")
        .join(comp.withColumnRenamed("node", "bi"), "bi")
        .groupBy(col("ai").as("vec_id")).agg(min(col("lbl")).as("blbl"))
      cells.select("vec_id")
        .join(deg, "vec_id")
        .join(comp.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
        .join(borderLbl, Seq("vec_id"), "left")
        .select(col("vec_id"), col("n_nbr"),
          when(col("lbl").isNotNull, "core")
            .when(col("blbl").isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce(col("lbl"), col("blbl"), lit(-1L)).as("cluster"))
        .orderBy("vec_id")
    }
  )

  /** UCB1 bandit arm scoring — the SEQUENTIAL-experimentation
    * complement to [[abtest]]'s fixed-split z-test: after the logged
    * horizon, each arm (event type) gets its empirical mean reward
    * plus the exploration bonus sqrt(2·ln N / n), and the next arm to
    * pull is the argmax. This is the traffic-allocation readout an
    * online experimentation stack recomputes per batch.
    *
    * Determinism: pulls/wins are exact BIGINTs from one aggregation;
    * the UCB score is one shared ln/sqrt chain rounded to the 9-grid;
    * the chosen arm is the sort-limit-1 row (score desc, arm asc)
    * broadcast back — no unpartitioned window, ties break
    * lexicographically.
    *
    * Scale: one map-side-combined fact aggregation to |arms| rows;
    * everything downstream is arms-sized with single-row broadcasts.
    */
  private val ucb = QueryDef(
    "q_ucb",
    "UCB1 bandit scoring of event types (reward = value >= 100): " +
      "per arm the pulls, wins, mean reward and 9-grid UCB score, " +
      "with the argmax arm flagged as the next pull.",
    Some("""WITH a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS pulls,
           |                  CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS wins
           |           FROM events GROUP BY 1),
           |t AS (SELECT CAST(sum(pulls) AS BIGINT) AS np FROM a),
           |u AS (SELECT event_type, pulls, wins,
           |             round(CAST(wins AS DOUBLE) / pulls, 6) AS mean_reward,
           |             round(CAST(wins AS DOUBLE) / pulls
           |                   + sqrt(2 * ln(CAST(np AS DOUBLE)) / pulls), 9) AS ucb_score
           |      FROM a CROSS JOIN t),
           |best AS (SELECT event_type AS best_arm FROM u
           |         ORDER BY ucb_score DESC, event_type LIMIT 1)
           |SELECT event_type, pulls, wins, mean_reward, ucb_score,
           |       event_type = best_arm AS chosen
           |FROM u CROSS JOIN best ORDER BY event_type""".stripMargin),
    (s, d) => {
      val a = events(s, d)
        .groupBy("event_type")
        .agg(lng(count(lit(1))).as("pulls"),
          lng(sum(when(col("value") >= 100, 1L).otherwise(0L))).as("wins"))
      val t = a.agg(lng(sum(col("pulls"))).as("np"))
      val u = a.crossJoin(broadcast(t))
        .select(col("event_type"), col("pulls"), col("wins"),
          round(dbl(col("wins")) / col("pulls"), 6).as("mean_reward"),
          round(dbl(col("wins")) / col("pulls")
            + sqrt(lit(2) * log(dbl(col("np"))) / col("pulls")), 9).as("ucb_score"))
        .persist()
      val best = u.orderBy(col("ucb_score").desc, col("event_type")).limit(1)
        .select(col("event_type").as("best_arm"))
      materializeThenRelease(
        u.crossJoin(broadcast(best))
          .select(col("event_type"), col("pulls"), col("wins"),
            col("mean_reward"), col("ucb_score"),
            (col("event_type") === col("best_arm")).as("chosen")),
        u)
        .orderBy("event_type")
    }
  )

  val defs: Seq[QueryDef] = Seq(entropy, benford, cohortMatrix, copurchase,
    xentropy, seasonality, abtest, kmeans, survival, dbscan, ucb)
}
