package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Graph analytics over the order graph (beyond the connected-
  * components operator in `graft.ops.ConnectedComponents`): fixed-
  * iteration PageRank on the customer–supplier trade graph.
  *
  * Determinism (SURVEY.md §7.5): ranks are exact BIGINT fixed-point
  * ("microrank", scale 1e12) and every per-iteration step is integer
  * arithmetic — `rank div outdeg` floor division for contributions,
  * integer teleport term — so iteration order, partitioning and engine
  * cannot move a single bit. This is PageRank with floor rounding: each
  * division drops < 1 microrank unit, a ~1e-12 relative perturbation
  * per iteration, far below any ranking-relevant difference, in
  * exchange for hash-exact reproducibility (IEEE or decimal division
  * would tie-break differently across engines).
  */
object GraphQueries {

  private val Scale = 1000000000000L // 1e12 microrank units = rank 1.0

  /** Node-count ceiling for the broadcast-rank regime. A rank row is
    * two longs (~16 B + row overhead), so 2M nodes ≈ 50–80 MB broadcast
    * — the sensible upper bound for per-iteration rebroadcast. Above
    * it the loop switches to the co-partitioned join regime below.
    * Overridable (mainly for tests) via this session conf.
    */
  private[graft] val BroadcastMaxNodesConf =
    "spark.graft.pagerank.broadcastMaxNodes"
  private val DefaultBroadcastMaxNodes = 2000000L

  /** Everything a caller (the graded query, or a plan-shape spec) needs
    * from one PageRank build: the unsorted (id, microrank) result, the
    * persisted edge table to unpersist after materialization, and which
    * regime the node count selected.
    */
  private[graft] final case class PagerankBuild(
      ranks: DataFrame, persistedEdges: DataFrame, broadcastRegime: Boolean)

  /** Three fixed-point iterations with a SIZE-CONDITIONAL rank-join
    * strategy. The node count (one bounded count over the persisted
    * degree table — rows = nodes) picks the regime:
    *
    *   - nodes ≤ broadcastMaxNodes: the node-sized rank table is
    *     broadcast against the persisted edge list each iteration —
    *     edges never shuffle at all;
    *   - nodes > broadcastMaxNodes: the edge list is pre-partitioned by
    *     `src` ONCE (and persisted with that partitioning), and each
    *     iteration's rank table arrives already hash-partitioned on its
    *     id (it is the output of the previous groupBy("id")), so the
    *     per-iteration join is co-partitioned and the only shuffle per
    *     iteration is the unavoidable contribution sum by dst.
    *
    * Both regimes run identical integer arithmetic, so they are
    * bit-identical (GraphShapesSpec pins this plus the join strategy
    * of each regime).
    */
  private[graft] def buildPagerank(s: SparkSession, d: String): PagerankBuild = {
    val e = edges(s, d).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).persist()
    // every node appears as a src (edges are symmetric), so the degree
    // table IS the node list — no second distinct pass over the edges
    val nodes = deg.select(col("src").as("id"))
    // bounded driver job: one row per node group, counted not collected
    val nNodes = deg.count()
    val maxBroadcast = s.conf
      .getOption(BroadcastMaxNodesConf).map(_.toLong)
      .getOrElse(DefaultBroadcastMaxNodes)
    val broadcastRegime = nNodes <= maxBroadcast
    val n = nodes.agg(count(lit(1)).as("n"))
    val eDegBase = e.join(deg, "src") // (src, dst, outdeg), reused each iter
    val eDeg =
      (if (broadcastRegime) eDegBase else eDegBase.repartition(col("src")))
        .persist()
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("id"), expr(s"${Scale}L div n").as("rank"))
    for (_ <- 1 to 3) {
      val rankBySrc = {
        val r = ranks.withColumnRenamed("id", "src")
        if (broadcastRegime) broadcast(r) else r
      }
      val contrib = eDeg
        .join(rankBySrc, "src")
        .select(col("dst").as("id"), expr("rank div outdeg").as("part"))
        .groupBy("id").agg(sum(col("part")).as("c"))
      ranks = nodes.crossJoin(broadcast(n))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (expr(s"${15 * Scale}L div (100 * n)") +
            expr("(85 * coalesce(c, 0L)) div 100")).as("rank"))
    }
    val out = ranks.select(col("id"), lng(col("rank")).as("microrank"))
    PagerankBuild(out, e, broadcastRegime)
  }

  /** Undirected bipartite trade edges: customer c ↔ supplier 100000+s
    * for every (custkey, suppkey) pair that traded. Both directions are
    * materialized, so every node in the edge set has outdegree ≥ 1 —
    * no dangling-mass correction needed.
    */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val pairs = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      // the 100000+suppkey encoding is only injective while custkey <
      // 100000 (TPC-H sf >= ~0.7 breaks it). Enforce the invariant in
      // the data path — a per-row codegen'd branch, so a scale that
      // breaks the encoding fails loudly instead of producing a
      // wrong-but-plausible graph (ADVICE r10); every consumer
      // (pagerank/hits/random_walk/...) shares this guard
      .select(when(col("o_custkey") < 100000L, col("o_custkey"))
        .otherwise(raise_error(lit(
          "graph node namespace collision: o_custkey >= 100000"))).as("c"),
        (col("l_suppkey") + 100000L).as("sup"))
      .distinct()
    pairs.select(col("c").as("src"), col("sup").as("dst"))
      .unionByName(pairs.select(col("sup").as("src"), col("c").as("dst")))
  }

  private val pagerank = QueryDef(
    "q_pagerank",
    "Fixed-point PageRank (3 iterations, damping 0.85) over the " +
      "undirected customer–supplier trade graph, in exact BIGINT " +
      "microrank arithmetic (see object scaladoc — floor division " +
      "makes every iteration engine- and partitioning-exact). Each " +
      "iteration joins the rank table against the persisted edge list " +
      "and runs one map-side-combining sum per destination; the rank " +
      "join strategy is SIZE-CONDITIONAL (buildPagerank): broadcast " +
      "while the node count fits spark.graft.pagerank.broadcastMaxNodes " +
      "(default 2M), else a co-partitioned join against the edge list " +
      "pre-partitioned by src — both regimes bit-identical and pinned " +
      "by GraphShapesSpec. The oracle unrolls the same three " +
      "iterations as chained CTEs.",
    Some("""WITH pairs AS (SELECT DISTINCT o_custkey AS c, 100000 + l_suppkey AS sup
           |               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |e AS (SELECT c AS src, sup AS dst FROM pairs
           |      UNION ALL SELECT sup, c FROM pairs),
           |nodes AS (SELECT DISTINCT src AS id FROM e),
           |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
           |nn AS (SELECT count(*) AS n FROM nodes),
           |r0 AS (SELECT id, 1000000000000 // n AS rank FROM nodes CROSS JOIN nn),
           |c1 AS (SELECT e.dst AS id, sum(r0.rank // deg.outdeg) AS c
           |       FROM e JOIN r0 ON e.src = r0.id JOIN deg ON e.src = deg.src GROUP BY 1),
           |r1 AS (SELECT nodes.id,
           |         (15000000000000 // (100 * nn.n)) + (85 * coalesce(c1.c, 0)) // 100 AS rank
           |       FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.id = nodes.id),
           |c2 AS (SELECT e.dst AS id, sum(r1.rank // deg.outdeg) AS c
           |       FROM e JOIN r1 ON e.src = r1.id JOIN deg ON e.src = deg.src GROUP BY 1),
           |r2 AS (SELECT nodes.id,
           |         (15000000000000 // (100 * nn.n)) + (85 * coalesce(c2.c, 0)) // 100 AS rank
           |       FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.id = nodes.id),
           |c3 AS (SELECT e.dst AS id, sum(r2.rank // deg.outdeg) AS c
           |       FROM e JOIN r2 ON e.src = r2.id JOIN deg ON e.src = deg.src GROUP BY 1),
           |r3 AS (SELECT nodes.id,
           |         (15000000000000 // (100 * nn.n)) + (85 * coalesce(c3.c, 0)) // 100 AS rank
           |       FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.id = nodes.id)
           |SELECT id, CAST(rank AS BIGINT) AS microrank
           |FROM r3 ORDER BY id""".stripMargin),
    (s, d) => {
      val b = buildPagerank(s, d)
      val out = b.ranks
        .orderBy("id")
        // persist before the orderBy sampling pass re-executes the
        // 3-join lineage (graft-round3 orderBy-resampling rule)
        .persist()
      out.count()
      b.persistedEdges.unpersist()
      out
    }
  )

  private val triangles = QueryDef(
    "q_triangles",
    "Triangle count of the co-purchase graph (parts are adjacent iff " +
      "some order contains both) via DEGREE-ORDERED ORIENTATION — the " +
      "shape that makes triangle counting feasible at scale: every " +
      "edge is directed from its lower-(degree, id) endpoint to its " +
      "higher one, so each triangle is counted exactly once at its " +
      "minimum-rank vertex and per-node out-degree is O(√m), bounding " +
      "the work even on power-law hubs. Closure is a codegen'd sorted-" +
      "merge intersection of out-neighbor arrays per edge — the wedge " +
      "set is never materialized and nothing shuffles per wedge. Edge " +
      "building is order-local (per-order sorted part sets collected " +
      "in one map-side-combined shuffle, C(k,2) pairs generated " +
      "in-task — no fact self-join). All counts exact BIGINT. " +
      "The oracle brute-forces the canonical p1<p2<p3 triple join, " +
      "proving the orientation + intersection lossless.",
    Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
           |           FROM lineitem a JOIN lineitem b
           |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           |       (SELECT CAST(count(*) AS BIGINT)
           |        FROM e e1 JOIN e e2 ON e1.p2 = e2.p1
           |                  JOIN e e3 ON e1.p1 = e3.p1 AND e2.p2 = e3.p2) AS n_triangles""".stripMargin),
    (s, d) => {
      // edge build is ORDER-LOCAL (q_item_recs discipline): per-order
      // sorted distinct part sets collect in one map-side-combined
      // shuffle and the C(k,2) pairs generate in-task from the bounded
      // arrays — no fact self-join, one exchange fewer than the
      // equivalent a⋈b on l_orderkey
      val baskets = lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      val pairExpr = expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps) - i - 1),
          |            y -> struct(x AS p1, y AS p2))))""".stripMargin)
      val e = baskets.select(explode(pairExpr).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .distinct()
        .persist()
      // total (degree, id) order; orient each edge low-rank → high-rank
      val deg = e.select(col("p1").as("id"))
        .unionByName(e.select(col("p2").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val withDeg = e
        .join(deg.withColumnRenamed("id", "p1").withColumnRenamed("deg", "d1"), "p1")
        .join(deg.withColumnRenamed("id", "p2").withColumnRenamed("deg", "d2"), "p2")
      val lowFirst = col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("p1") < col("p2"))
      val oriented = withDeg.select(
          when(lowFirst, struct(col("p1").as("src"), col("p2").as("dst")))
            .otherwise(struct(col("p2").as("src"), col("p1").as("dst"))).as("e"))
        .select(col("e.src"), col("e.dst"))
        .persist()
      // triangle {a≺b≺c} is counted exactly once: at edge (a,b), as
      // c ∈ N⁺(a) ∩ N⁺(b). Adjacency arrays are sorted-distinct, so the
      // codegen'd merge scan counts the intersection without ever
      // materializing the wedge set (Σ|N⁺| per edge, not one row per
      // wedge — the shuffle carries ~2·Σdeg² longs instead of a
      // wedge-count row explosion plus a 3rd semi-join shuffle)
      val adj = oriented.groupBy("src")
        .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
      val tri = oriented
        .join(adj, "src")
        .withColumnRenamed("nbrs", "src_nbrs")
        .join(adj.withColumnRenamed("src", "dst").withColumnRenamed("nbrs", "dst_nbrs"),
          "dst") // inner: a dst with no out-edges contributes 0 triangles
        .agg(lng(sum(graft.functions.VectorFunctions.sortedIntersectCount(
          col("src_nbrs"), col("dst_nbrs")))).as("n_triangles"))
      val out = e.agg(lng(count(lit(1))).as("n_edges")).crossJoin(tri)
      val res = out.persist()
      res.count()
      e.unpersist()
      oriented.unpersist()
      res
    }
  )

  // ------------------------------------------------------------------ khop

  private val khop = QueryDef(
    "q_khop",
    "Landmark k-hop reach over the bipartite trade graph: for a " +
      "deterministic 1-in-20 sample of customers (custkey mod 20 = 0 " +
      "— the landmark set; sampling sources, not edges, is what " +
      "bounds BFS frontiers at scale), the count of suppliers traded " +
      "with (hop 1) and of OTHER customers sharing a supplier (hop " +
      "2). Hop 1 is a plain count over the (already-distinct) " +
      "landmark pair rows — no join, no distinct aggregation; hop 2 " +
      "is ONE key-partitioned join whose (custkey, c2) output de-dups " +
      "map-side via distinct BEFORE the counting exchange (a " +
      "countDistinct here would Expand the frontier 2× instead). The " +
      "frontier tables are (landmarks × degree)-bounded, never " +
      "all-pairs.",
    Some("""WITH pairs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sup
           |               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |src AS (SELECT DISTINCT c FROM pairs WHERE c % 20 = 0)
           |SELECT src.c AS custkey,
           |       CAST(count(DISTINCT p1.sup) AS BIGINT) AS n_hop1_suppliers,
           |       CAST(count(DISTINCT CASE WHEN p2.c <> src.c THEN p2.c END) AS BIGINT) AS n_hop2_customers
           |FROM src JOIN pairs p1 ON p1.c = src.c
           |         JOIN pairs p2 ON p2.sup = p1.sup
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val pairs = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
        .distinct()
        .persist()
      // pairs is distinct, so the landmark rows are distinct (c, sup):
      // hop-1 degree is a plain count, no join and no countDistinct
      val h1 = pairs.filter(col("c") % 20 === 0)
      val n1 = h1.groupBy(col("c").as("custkey"))
        .agg(lng(count(lit(1))).as("n_hop1_suppliers"))
      val n2 = h1.select(col("c").as("custkey"), col("sup").as("h1_sup"))
        .join(pairs.as("p2"), col("h1_sup") === col("p2.sup"))
        .filter(col("p2.c") =!= col("custkey"))
        .select(col("custkey"), col("p2.c").as("c2"))
        .distinct()
        .groupBy("custkey")
        .agg(lng(count(lit(1))).as("n_hop2_customers"))
      n1.join(n2, Seq("custkey"), "left")
        .select(col("custkey"), col("n_hop1_suppliers"),
          coalesce(col("n_hop2_customers"), lit(0L)).as("n_hop2_customers"))
        .orderBy("custkey")
    }
  )

  /** Neighbor-Jaccard link prediction over the supplier–part bipartite
    * graph: two suppliers are similar (substitutable, a candidate
    * missing link) when their part sets overlap. Score = |shared| /
    * |union| — pure count arithmetic, so the only float op is one
    * exact int64→double division.
    *
    * Scale: common-neighbor enumeration is quadratic in the degree of
    * the SHARED node, so the graph is first sparsified by dropping
    * hub parts (pdeg > 32) — the standard common-neighbor guard: a
    * hub's pairs cost deg² but each carries ≈ 0 similarity signal.
    * After the cap the self-join on p is co-partitioned (both sides
    * shuffle on p once), the pair aggregation partial-aggregates
    * map-side, and the supplier-degree joins are broadcast — bounded
    * by supplier-dimension cardinality, not edges; if that dimension
    * ever outgrows broadcast range, dropping the hint leaves a
    * key-partitioned join with the same semantics.
    */
  private val linkJaccard = QueryDef(
    "q_link_jaccard",
    "Link prediction by neighbor Jaccard: distinct supplier-part " +
      "edges, hub parts (degree > 32) dropped, supplier pairs scored " +
      "|shared parts| / |union of part sets|; top 50 by unrounded " +
      "score with (s1, s2) tie-break.",
    Some("""WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
           |pd AS (SELECT p, count(*) AS pdeg FROM e GROUP BY p),
           |es AS (SELECT s, e.p FROM e JOIN pd USING (p) WHERE pdeg <= 32),
           |sd AS (SELECT s, count(*) AS sdeg FROM es GROUP BY s),
           |inter AS (SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS shared
           |          FROM es a JOIN es b ON a.p = b.p AND a.s < b.s GROUP BY 1,2)
           |SELECT s1, s2, shared, CAST(sa.sdeg + sb.sdeg - shared AS BIGINT) AS unioned,
           |       round(CAST(shared AS DOUBLE)/(sa.sdeg+sb.sdeg-shared),6) AS jaccard
           |FROM inter JOIN sd sa ON sa.s = inter.s1 JOIN sd sb ON sb.s = inter.s2
           |ORDER BY CAST(shared AS DOUBLE)/(sa.sdeg+sb.sdeg-shared) DESC, s1, s2
           |LIMIT 50""".stripMargin),
    (s, d) => {
      val e = lineitem(s, d)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct()
      val pd = e.groupBy("p").agg(count(lit(1)).as("pdeg"))
      val es = e.join(pd.filter(col("pdeg") <= 32), "p").select("s", "p")
      val sd = es.groupBy("s").agg(count(lit(1)).as("sdeg"))
      // the co-part self-join is quadratic in per-part degree —
      // compute-heavy but byte-light, so AQE's size-based coalescing
      // would fold the exchange to ~1 partition and run the pair
      // explosion single-threaded (profiled: one 3.2 s task at sf0.1).
      // An explicit fixed-count repartition on the join key is exempt
      // from AQE coalescing and both self-join sides reuse the one
      // exchange, so this pins the declared parallelism at no extra
      // shuffle.
      val esp = es.repartition(
        s.conf.get("spark.sql.shuffle.partitions").toInt, col("p"))
      val inter = esp.select(col("s").as("s1"), col("p"))
        .join(esp.select(col("s").as("s2"), col("p")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .groupBy("s1", "s2")
        .agg(lng(count(lit(1))).as("shared"))
      inter
        .join(broadcast(sd.select(col("s").as("s1"), col("sdeg").as("deg1"))), "s1")
        .join(broadcast(sd.select(col("s").as("s2"), col("sdeg").as("deg2"))), "s2")
        .withColumn("unioned", lng(col("deg1") + col("deg2") - col("shared")))
        .withColumn("score", dbl(col("shared")) / col("unioned"))
        .orderBy(col("score").desc, col("s1"), col("s2"))
        .limit(50)
        .select(col("s1"), col("s2"), col("shared"), col("unioned"),
          round(col("score"), 6).as("jaccard"))
    }
  )

  /** Newman modularity of a FIXED partition (supplier nation) over the
    * supplier co-part graph — the partition-quality metric a community
    * pipeline reports: Q = Σ_c (e_c/m − (d_c/2m)²), emitted per
    * community so analysts see which communities carry structure (on
    * the synthetic random bipartite projection every term ≈ 0 — the
    * honest "no nation structure" readout, and exactly what the metric
    * is for).
    *
    * Scale: edge generation reuses q_link_jaccard's hub-capped
    * co-part pair shape (sparsify, co-partitioned self-join, distinct);
    * community tagging is two broadcast joins against the
    * supplier-dimension table; the per-community reductions are
    * map-side-combined counts over ≈ nation-cardinality groups. Output
    * avoids any cross-community double sum — each row's arithmetic is
    * exact int64→double divisions only, so no ordered float
    * accumulation exists anywhere.
    */
  private val modularity = QueryDef(
    "q_modularity",
    "Per-community Newman modularity terms of the nation partition " +
      "over the hub-capped supplier co-part graph: intra-community " +
      "edges, degree sums, and e_c/m - (d_c/2m)^2 per nation.",
    Some("""WITH e AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
           |pd AS (SELECT p, count(*) AS pdeg FROM e GROUP BY p),
           |es AS (SELECT s, e.p FROM e JOIN pd USING (p) WHERE pdeg <= 32),
           |pairs AS (SELECT DISTINCT a.s AS s1, b.s AS s2 FROM es a JOIN es b ON a.p = b.p AND a.s < b.s),
           |com AS (SELECT s_suppkey AS s, s_nationkey AS c FROM supplier),
           |ep AS (SELECT p.s1, p.s2, c1.c AS c1, c2.c AS c2 FROM pairs p
           |       JOIN com c1 ON c1.s = p.s1 JOIN com c2 ON c2.s = p.s2),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ep),
           |intra AS (SELECT c1 AS c, CAST(count(*) AS BIGINT) AS e_c FROM ep WHERE c1 = c2 GROUP BY 1),
           |deg AS (SELECT c, CAST(sum(n) AS BIGINT) AS d_c FROM (
           |  SELECT c1 AS c, count(*) AS n FROM ep GROUP BY 1
           |  UNION ALL SELECT c2 AS c, count(*) AS n FROM ep GROUP BY 1) t GROUP BY c)
           |SELECT deg.c AS community, coalesce(intra.e_c, 0) AS intra_edges, deg.d_c AS degree_sum,
           |       round(CAST(coalesce(intra.e_c, 0) AS DOUBLE) / m.m
           |             - (CAST(deg.d_c AS DOUBLE) / (2 * m.m)) * (CAST(deg.d_c AS DOUBLE) / (2 * m.m)), 6) AS q_term
           |FROM deg LEFT JOIN intra ON intra.c = deg.c CROSS JOIN m ORDER BY community""".stripMargin),
    (s, d) => {
      val e = lineitem(s, d)
        .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct()
      val pd = e.groupBy("p").agg(count(lit(1)).as("pdeg"))
      val es = e.join(pd.filter(col("pdeg") <= 32), "p").select("s", "p")
      // same compute-heavy self-join as q_link_jaccard: pin the
      // declared parallelism against AQE's byte-based coalescing
      val esp = es.repartition(
        s.conf.get("spark.sql.shuffle.partitions").toInt, col("p"))
      val pairs = esp.select(col("s").as("s1"), col("p"))
        .join(esp.select(col("s").as("s2"), col("p")), Seq("p"))
        .filter(col("s1") < col("s2"))
        .select("s1", "s2").distinct()
      val com = supplier(s, d)
        .select(col("s_suppkey").as("sk"), col("s_nationkey").as("c"))
      val ep = pairs
        .join(broadcast(com.select(col("sk").as("s1"), col("c").as("c1"))), "s1")
        .join(broadcast(com.select(col("sk").as("s2"), col("c").as("c2"))), "s2")
        .select("c1", "c2")
      val m = ep.agg(count(lit(1)).as("m"))
      val intra = ep.filter(col("c1") === col("c2"))
        .groupBy(col("c1").as("c")).agg(lng(count(lit(1))).as("e_c"))
      val deg = ep.select(col("c1").as("c")).unionAll(ep.select(col("c2").as("c")))
        .groupBy("c").agg(lng(count(lit(1))).as("d_c"))
      deg.join(intra, Seq("c"), "left").crossJoin(broadcast(m))
        .select(col("c").as("community"),
          coalesce(col("e_c"), lit(0L)).as("intra_edges"),
          col("d_c").as("degree_sum"),
          round(dbl(coalesce(col("e_c"), lit(0L))) / col("m")
            - (dbl(col("d_c")) / (lit(2) * col("m")))
              * (dbl(col("d_c")) / (lit(2) * col("m"))), 6).as("q_term"))
        .orderBy("community")
    }
  )

  // ------------------------------------------------------------------- hits

  private val hits = QueryDef(
    "q_hits",
    "HITS hubs & authorities (Kleinberg) over the DIRECTED trade " +
      "graph customer → supplier — PageRank's sibling that separates " +
      "the two roles an undirected rank conflates: hub score = how " +
      "broadly a customer buys, authority score = how broadly a " +
      "supplier is bought from, each recursively weighted by the " +
      "other side. Two mutual-reinforcement rounds in exact BIGINT " +
      "arithmetic: a ← Σ h over in-edges, h ← Σ a over out-edges, " +
      "each vector rescaled to max = 1e6 by floor division (max-" +
      "normalization replaces the usual L2 norm — same fixpoint " +
      "ranking, zero float ops; the q_pagerank microrank discipline " +
      "at a scale chosen so the pre-normalization sums stay in " +
      "BIGINT: score·degree < 2^63 holds up to ~9.2e12 distinct " +
      "partners per node — far beyond any real trade graph). " +
      "Shape: one distinct pass builds the edge list; each half-round " +
      "is one map-side-combined sum keyed on one endpoint plus a " +
      "single-row max broadcast; the supplier-keyed authority table " +
      "is dim-sized and broadcasts into the customer-side sum, the " +
      "customer-keyed hub table joins co-partitioned on the edge " +
      "list's customer key. The oracle unrolls the same rounds as " +
      "chained CTEs.",
    Some("""WITH e AS (SELECT DISTINCT o_custkey AS c, 100000 + l_suppkey AS sup
           |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |a1 AS (SELECT sup, count(*) AS a FROM e GROUP BY 1),
           |ma1 AS (SELECT max(a) AS m FROM a1),
           |a1n AS (SELECT sup, a * 1000000 // ma1.m AS an FROM a1 CROSS JOIN ma1),
           |h1 AS (SELECT e.c, sum(a1n.an) AS h FROM e JOIN a1n USING (sup) GROUP BY 1),
           |mh1 AS (SELECT max(h) AS m FROM h1),
           |h1n AS (SELECT c, h * 1000000 // mh1.m AS hn FROM h1 CROSS JOIN mh1),
           |a2 AS (SELECT e.sup, sum(h1n.hn) AS a FROM e JOIN h1n USING (c) GROUP BY 1),
           |ma2 AS (SELECT max(a) AS m FROM a2),
           |a2n AS (SELECT sup, a * 1000000 // ma2.m AS an FROM a2 CROSS JOIN ma2)
           |SELECT CAST(c AS BIGINT) AS id, 'hub' AS role, CAST(hn AS BIGINT) AS score
           |FROM h1n
           |UNION ALL
           |SELECT CAST(sup AS BIGINT), 'auth', CAST(an AS BIGINT) FROM a2n
           |ORDER BY role, id""".stripMargin),
    (s, d) => {
      val e = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (col("l_suppkey") + 100000L).as("sup"))
        .distinct()
        // both half-rounds and the final union re-read the edge list —
        // one shuffle builds it, every consumer reuses the materialization
        .persist()
      // round 1 authority: in-degree (h0 = 1), rescaled to max = 1e6.
      // Each score table feeds BOTH its max-broadcast subquery and the
      // next half-round — persist them (all dim-sized) so neither chain
      // re-runs the upstream rounds
      val a1 = e.groupBy("sup").agg(count(lit(1)).as("a")).persist()
      val ma1 = a1.agg(max("a").as("m"))
      val a1n = a1.crossJoin(broadcast(ma1))
        .select(col("sup"), expr("(a * 1000000L) div m").as("an"))
      // round 1 hub: supplier-keyed authorities are dim-sized — broadcast
      val h1 = e.join(broadcast(a1n), "sup")
        .groupBy("c").agg(sum("an").as("h")).persist()
      val mh1 = h1.agg(max("h").as("m"))
      val h1n = h1.crossJoin(broadcast(mh1))
        .select(col("c"), expr("(h * 1000000L) div m").as("hn"))
        .persist()
      // round 2 authority: customer-keyed hubs co-partition with the
      // edge list's customer key (both sides hash on c — no broadcast of
      // a customer-sized table at 100 TB)
      val a2 = e.join(h1n, "c")
        .groupBy("sup").agg(sum("hn").as("a")).persist()
      val ma2 = a2.agg(max("a").as("m"))
      val a2n = a2.crossJoin(broadcast(ma2))
        .select(col("sup"), expr("(a * 1000000L) div m").as("an"))
      h1n.select(lng(col("c")).as("id"), lit("hub").as("role"),
          lng(col("hn")).as("score"))
        .unionByName(a2n.select(lng(col("sup")).as("id"),
          lit("auth").as("role"), lng(col("an")).as("score")))
        .orderBy("role", "id")
    }
  )

  // ------------------------------------------------------------ label prop

  private val labelProp = QueryDef(
    "q_label_prop",
    "Community DETECTION by synchronous label propagation (Raghavan et " +
      "al. 2007) over the undirected trade graph — the missing piece " +
      "next to q_modularity (which SCORES a given partition) and the " +
      "CC operator (which finds connectivity, not density): two " +
      "synchronous rounds, each node adopting its neighbors' most " +
      "frequent label with the deterministic (count desc, label asc) " +
      "tie-break that replaces the textbook's random choice (SURVEY " +
      "§7.5 — synchronous + total tie order ⇒ partitioning- and " +
      "engine-independent). Round 1 degenerates to min-neighbor-id " +
      "(all initial labels are distinct); round 2 propagates real " +
      "frequencies. Output: per-community size and id range. Shape: " +
      "per round, ONE co-partitioned join of the node-sized label " +
      "table onto the edge list (no broadcast of a node-sized table " +
      "at 100 TB), a map-side-combined (node, label) count, and a " +
      "per-node window argmax — O(E) per round, O(log) rounds in " +
      "production use, fixed 2 here for a bounded oracle.",
    Some("""WITH e AS (SELECT DISTINCT o_custkey AS c, 100000 + l_suppkey AS sup
           |           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |und AS (SELECT c AS src, sup AS dst FROM e
           |        UNION ALL SELECT sup, c FROM e),
           |n1 AS (SELECT dst AS id, src AS lbl, count(*) AS n FROM und GROUP BY 1, 2),
           |l1 AS (SELECT id, lbl FROM (
           |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY n DESC, lbl) AS rn
           |  FROM n1) WHERE rn = 1),
           |n2 AS (SELECT u.dst AS id, l.lbl, count(*) AS n
           |       FROM und u JOIN l1 l ON u.src = l.id GROUP BY 1, 2),
           |l2 AS (SELECT id, lbl FROM (
           |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY n DESC, lbl) AS rn
           |  FROM n2) WHERE rn = 1)
           |SELECT CAST(lbl AS BIGINT) AS community,
           |       CAST(count(*) AS BIGINT) AS n_members,
           |       CAST(min(id) AS BIGINT) AS min_id,
           |       CAST(max(id) AS BIGINT) AS max_id
           |FROM l2 GROUP BY 1 ORDER BY community""".stripMargin),
    (s, d) => {
      val e = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"),
          (col("l_suppkey") + 100000L).as("sup"))
        .distinct()
      // symmetric closure once, reused by both rounds
      val und = e.select(col("c").as("src"), col("sup").as("dst"))
        .unionByName(e.select(col("sup").as("src"), col("c").as("dst")))
        .persist()
      val aw = Window.partitionBy("id").orderBy(col("n").desc, col("lbl"))
      def argmax(counts: DataFrame): DataFrame = counts
        .withColumn("rn", row_number().over(aw))
        .filter(col("rn") === 1).select(col("id"), col("lbl"))
      // round 1: initial labels are the node ids themselves, so the
      // neighbor-label counts ARE the edge rows — no join needed
      val l1 = argmax(und.groupBy(col("dst").as("id"), col("src").as("lbl"))
        .agg(count(lit(1)).as("n")))
        .persist()
      // round 2: node-sized label table joins co-partitioned on src
      val l2 = argmax(und.join(l1.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("n")))
      l2.groupBy(col("lbl").as("community"))
        .agg(lng(count(lit(1))).as("n_members"),
          lng(min(col("id"))).as("min_id"),
          lng(max(col("id"))).as("max_id"))
        .select(lng(col("community")).as("community"), col("n_members"),
          col("min_id"), col("max_id"))
        .orderBy("community")
    }
  )

  // ------------------------------------------------------------------ kcore

  /** k-core peeling over the part co-purchase graph (parts are
    * adjacent when some order contains both), TO CONVERGENCE: peel
    * rounds at threshold k = the exact 5th-percentile initial degree
    * repeat until a round peels nothing, so peel_round 0 is an honest
    * degeneracy statement — the node IS in the k-core (VERDICT r10
    * #8; the previous fixed-4-round form left the cascade truncated;
    * the p10 threshold it used cascades the ENTIRE graph at every SF,
    * so with convergence semantics the core would be trivially empty
    * — p5 keeps both a multi-round cascade and a surviving core:
    * 188/1857/18681 core nodes in 3/5/10 rounds at sf0.001/0.01/0.1,
    * spec-pinned at sf0.001); [[KcoreCap]] bounds
    * the pass count at a pathological scale, and BOTH engines iterate
    * the identical capped schedule — the oracle unrolls exactly
    * KcoreCap rounds (converged rounds peel nothing and are no-ops),
    * while the Spark loop early-exits once a peel round comes back
    * empty.
    *
    * Determinism: degrees, histogram cumsum and the percentile pick
    * are all exact integer operations; each round's peel set is a pure
    * function of the previous round — no randomness, no float.
    *
    * Scale: the pair generation self-joins the distinct (order, part)
    * set on orderkey, so each order contributes C(parts-in-order, 2)
    * pairs — basket-bounded like q_copurchase, never quadratic in part
    * popularity. Each round is one map-side-combined degree count +
    * two key-partitioned anti joins on a SHRINKING edge list; the
    * histogram cumsum window runs on ≤ distinct-degree-values rows;
    * the per-round emptiness check is one action on an
    * already-materialized (localCheckpoint) frame. Round count is
    * O(log-ish cascade depth), observed single digits.
    */
  private[graft] val KcoreCap = 16

  private val kcoreDuck: String = {
    val rounds = (1 to KcoreCap).map { i =>
      val q = i - 1
      s"""p$i AS MATERIALIZED (SELECT s$q.id FROM s$q LEFT JOIN d$q ON s$q.id = d$q.id
         |       CROSS JOIN kk WHERE coalesce(d$q.deg, 0) < k),
         |e$i AS MATERIALIZED (SELECT c.src, c.dst FROM e$q c
         |       ANTI JOIN p$i a ON c.src = a.id ANTI JOIN p$i b ON c.dst = b.id),
         |s$i AS MATERIALIZED (SELECT s$q.id FROM s$q ANTI JOIN p$i ON s$q.id = p$i.id),
         |d$i AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM e$i GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val peelUnion = (1 to KcoreCap)
      .map(i => s"SELECT id, $i AS peel_round, CAST(0 AS BIGINT) AS core_deg FROM p$i")
      .mkString("\n  UNION ALL ")
    s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (SELECT DISTINCT a.p AS src, b.p AS dst
       |      FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
       |d0 AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM e0 GROUP BY 1),
       |s0 AS (SELECT id FROM d0),
       |nn AS (SELECT count(*) AS n FROM d0),
       |hist AS (SELECT deg, count(*) AS c FROM d0 GROUP BY 1),
       |cum AS (SELECT deg, sum(c) OVER (ORDER BY deg) AS cum FROM hist),
       |kk AS (SELECT min(deg) AS k FROM cum CROSS JOIN nn
       |       WHERE cum >= (n + 19) // 20),
       |$rounds,
       |out AS (
       |  $peelUnion
       |  UNION ALL SELECT s$KcoreCap.id, 0, coalesce(d$KcoreCap.deg, 0)
       |            FROM s$KcoreCap LEFT JOIN d$KcoreCap ON s$KcoreCap.id = d$KcoreCap.id)
       |SELECT CAST(out.id AS BIGINT) AS id,
       |       CAST(out.peel_round AS BIGINT) AS peel_round,
       |       CAST(d0.deg AS BIGINT) AS deg0,
       |       CAST(out.core_deg AS BIGINT) AS core_deg,
       |       CAST(kk.k AS BIGINT) AS k
       |FROM out JOIN d0 ON out.id = d0.id CROSS JOIN kk
       |ORDER BY id""".stripMargin
  }

  private val kcore = QueryDef(
    "q_kcore",
    "k-core peeling to convergence (data-derived round count, capped " +
      s"at $KcoreCap) of the part co-purchase graph at k = the exact " +
      "p5 initial degree: per part, the round it was peeled (0 = in " +
      "the k-core), its initial degree, and its residual in-core " +
      "degree — all-integer, engine-exact.",
    Some(kcoreDuck),
    (s, d) => {
      val op = lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      // adjacency-list graph representation (VERDICT r12 #7 re-plan):
      // ONE shuffle folds the co-purchase pair stream straight into
      // per-node in-neighbor sets (collect_set dedups, replacing the
      // separate edge distinct), so every later pass over the graph
      // scans NODE-sized rows, never the edge list. Per-group state is
      // one node's neighbor set — bounded by the co-purchase degree
      // (parts per order × orders per part), the same bound the edge
      // list itself carries per key.
      val adj = op.as("a").join(op.as("b"),
          col("a.o") === col("b.o") && col("a.p") =!= col("b.p"))
        .groupBy(col("b.p").as("id"))
        .agg(collect_set(col("a.p")).as("nbrs"))
        .persist()
      val d0 = adj.select(col("id"), size(col("nbrs")).cast("long").as("deg"))
      // exact p10 degree from the bounded degree histogram; the cumsum
      // window covers ≤ distinct-degree-values rows. ONE bounded
      // driver collect (coreset discipline) so the threshold feeds the
      // per-round filters as a literal.
      val n = adj.count()
      val hist = d0.groupBy("deg").agg(count(lit(1)).as("c"))
      val wCum = Window.orderBy("deg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val k = hist.withColumn("cum", sum("c").over(wCum))
        .filter(col("cum") >= (n + 19) / 20)
        .agg(min("deg")).head().getLong(0)
      // degree-decrement peel (VERDICT r12 #7 re-plan): the edge list
      // is NEVER rewritten — per round ONE job joins the node-sized
      // adjacency table against the (small) peel set, explodes ONLY
      // the matched rows' neighbor lists (edges into the peel — a
      // fringe-sized stream), counts each survivor's losses, and
      // decrements a NODE-sized (id, deg) state. The old form
      // checkpointed the shrinking edge list every round (edge-sized
      // writes × rounds) and scanned every edge per round; this scans
      // nodes and touches only fringe edges. In-core degree falls out
      // of the state at convergence — deg(id) − edges-to-all-ever-
      // peeled IS the residual degree, by induction over rounds.
      //
      // localCheckpoint, not persist: each round references the
      // previous round's frame several times, so without lineage
      // truncation the logical plan grows exponentially and Catalyst
      // ANALYSIS (not execution) dominates wall time (profiled: 135 s
      // at sf0.001 with persist-only). The ConnectedComponents
      // scaladoc documents the same trap.
      // per round TWO jobs: the cheap isEmpty probe over the
      // materialized node-sized state, and the state-update
      // checkpoint. (An Observation-metric fusion of the probe into
      // the update job was A/B-profiled at +0.8 s — the async
      // listener wait per round costs more than the probe job.)
      var state = d0.select(col("id"), col("deg")).localCheckpoint(true)
      val peels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var round = 0
      var converged = false
      while (!converged && round < KcoreCap) {
        round += 1
        // a filtered scan of the materialized node-sized state — the
        // fixpoint probe: an empty peel means every remaining node
        // holds degree >= k (the k-core) and the oracle's remaining
        // unrolled rounds are provably no-ops
        val peel = state.filter(col("deg") < k).select("id")
        if (peel.isEmpty) converged = true
        else {
          peels += peel.withColumn("peel_round", lit(round.toLong))
          // edges INTO this round's peel set, via the adjacency rows
          // of the peeled nodes only; no broadcast hint — the peel is
          // usually tiny and AQE broadcasts it, but a first-round
          // cascade at 100× data can be node-sized and must be
          // allowed to shuffle
          val dec = adj.join(peel, Seq("id"))
            .select(explode(col("nbrs")).as("id"))
            .groupBy("id").agg(count(lit(1)).as("dec"))
          state = state.filter(col("deg") >= k)
            .join(dec, Seq("id"), "left")
            .select(col("id"),
              (col("deg") - coalesce(col("dec"), lit(0L))).as("deg"))
            .localCheckpoint(true)
        }
      }
      val core = state.select(col("id"), lit(0L).as("peel_round"),
        col("deg").as("core_deg"))
      val out = (peels.map(_.select(col("id"), col("peel_round"),
          lit(0L).as("core_deg"))) :+ core)
        .reduce(_ unionByName _)
      out.join(d0.withColumnRenamed("deg", "deg0"), "id")
        .select(lng(col("id")).as("id"), lng(col("peel_round")).as("peel_round"),
          lng(col("deg0")).as("deg0"), lng(col("core_deg")).as("core_deg"),
          lit(k).as("k"))
        .orderBy("id")
    }
  )

  // ------------------------------------------------------------ random walk

  /** Deterministic hash-seeded graph walks — the distributed analogue
    * of the random-walk corpus generators behind DeepWalk/node2vec
    * (walk sampling for embedding training, negative sampling,
    * neighborhood feature extraction). Randomness is replaced by the
    * repo's portable 48-bit md5 idiom: from node u at step t every
    * walker moves to argmin over neighbors v of h(u, t, v), so the
    * walk corpus is a pure function of the graph — identical across
    * runs, partitionings and engines, which is exactly what a
    * reproducible training-data pipeline wants from its walk sampler.
    *
    * Scale: all three transition functions are computed in ONE pass —
    * the edge list explodes ×3 (one row per step), the argmin is a
    * src-partitioned window (degree-bounded partitions), and the walk
    * itself is 3 broadcast-joinable hops of the node-sized frontier.
    * Nothing quadratic; the walk length is the only multiplier.
    */
  private val randomWalk = QueryDef(
    "q_random_walk",
    "Deterministic hash-greedy walks on the trade graph: every " +
      "customer walks 3 steps, step t moving from u to the neighbor " +
      "minimizing the portable 48-bit md5 of (u, t, v); emits per " +
      "(step, node) visit counts — the reproducible walk-sampling " +
      "primitive for embedding/negative-sampling corpora.",
    Some("""WITH pairs AS (SELECT DISTINCT o_custkey AS c, 100000 + l_suppkey AS sup
           |               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |e AS (SELECT c AS src, sup AS dst FROM pairs
           |      UNION ALL SELECT sup, c FROM pairs),
           |h AS (SELECT t, src, dst,
           |        CAST(concat('0x', substr(md5(src || ',' || t || ',' || dst), 1, 12)) AS BIGINT) AS hv
           |      FROM e CROSS JOIN (SELECT unnest(generate_series(1, 3)) AS t)),
           |trans AS (SELECT t, src, dst FROM (
           |            SELECT t, src, dst,
           |              row_number() OVER (PARTITION BY t, src ORDER BY hv, dst) AS rn
           |            FROM h) WHERE rn = 1),
           |w0 AS (SELECT DISTINCT c AS cur FROM pairs),
           |w1 AS (SELECT trans.dst AS cur FROM w0 JOIN trans
           |       ON trans.t = 1 AND trans.src = w0.cur),
           |w2 AS (SELECT trans.dst AS cur FROM w1 JOIN trans
           |       ON trans.t = 2 AND trans.src = w1.cur),
           |w3 AS (SELECT trans.dst AS cur FROM w2 JOIN trans
           |       ON trans.t = 3 AND trans.src = w2.cur),
           |visits AS (SELECT 1 AS step, cur FROM w1
           |           UNION ALL SELECT 2, cur FROM w2
           |           UNION ALL SELECT 3, cur FROM w3)
           |SELECT CAST(step AS BIGINT) AS step, CAST(cur AS BIGINT) AS node,
           |       CAST(count(*) AS BIGINT) AS n_visits
           |FROM visits GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val e = edges(s, d)
      // fixed-count repartition on the window keys BEFORE the md5 is
      // computed: the exploded edge stream is byte-small but md5-heavy,
      // and AQE's byte-based coalescing folds it to a handful of tasks
      // (SURVEY §4.2 r9 trap; profiled 2.0 s single-stage at sf0.1).
      // Hashing after the exchange puts the md5 work on all tasks, and
      // the argmin window reuses the exchange — no extra shuffle.
      val h = e.select(explode(sequence(lit(1), lit(3))).as("t"),
          col("src"), col("dst"))
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("t"), col("src"))
        .withColumn("hv", expr(
          "CAST(conv(substr(md5(concat_ws(',', src, t, dst)), 1, 12), 16, 10) AS BIGINT)"))
      val wArg = Window.partitionBy("t", "src").orderBy(col("hv"), col("dst"))
      val trans = h.withColumn("rn", row_number().over(wArg))
        .filter(col("rn") === 1)
        .select(col("t"), col("src"), col("dst"))
        .persist()
      def hop(frontier: DataFrame, t: Int): DataFrame =
        frontier.join(trans.filter(col("t") === t)
            .withColumnRenamed("src", "cur"), Seq("cur"))
          .select(col("dst").as("cur"))
      // start set from the persisted transition table, not from a
      // second edges() build (every customer appears as a src — the
      // edge list is symmetric, so rebuilding pairs would re-run the
      // orders⋈lineitem distinct: profiled as 2 extra scan stages).
      // src < 100000 is the node-NAMESPACE split, not a heuristic:
      // the shared edges() encoding maps suppliers to 100000+suppkey,
      // which is only injective while custkey < 100000 — the same
      // testdata invariant q_pagerank/q_hits already rely on (at a
      // scale that broke it, the graph encoding itself would collide
      // before this filter could diverge from the oracle's
      // DISTINCT-c-from-pairs form)
      val w0 = trans.filter(col("t") === 1 && col("src") < 100000L)
        .select(col("src").as("cur"))
      val w1 = hop(w0, 1).persist()
      val w2 = hop(w1, 2).persist()
      val w3 = hop(w2, 3)
      val visits = w1.select(lit(1L).as("step"), col("cur"))
        .unionByName(w2.select(lit(2L).as("step"), col("cur")))
        .unionByName(w3.select(lit(3L).as("step"), col("cur")))
      visits.groupBy("step", "cur")
        .agg(lng(count(lit(1))).as("n_visits"))
        .select(col("step"), lng(col("cur")).as("node"), col("n_visits"))
        .orderBy("step", "node")
    }
  )

  /** Source-sampled betweenness centrality (Brandes 2001, restricted
    * to 4 fixed supplier sources with a 3-level depth cap) — THE
    * broker-node readout the graph family lacked (pagerank scores
    * global influence, k-core cohesion, triangles clustering; none
    * measures WHO SITS ON SHORTEST PATHS, which is what betweenness
    * prices and what exact Brandes makes O(V·E) — the source-sampled
    * form is the standard scale approximation, deterministic here via
    * fixed sources instead of random ones).
    *
    * Forward phase: level-synchronous BFS per source, σ (shortest-
    * path counts) as exact BIGINT sums, level sets deduplicated by
    * per-root anti joins against the visited set. Backward phase:
    * dependency accumulation δ(v) = Σ_{w∈succ} σv/σw·(1+δw) unrolled
    * by level; each term is one shared IEEE chain rounded to the
    * 9-grid and summed as exact DECIMAL(38,9), so accumulation order
    * cannot move a bit. Output = top-20 nodes by the 6-grid rounded
    * centrality with node tie-break.
    *
    * Scale: per level ONE frontier×edge join (frontiers ≤ 4·nodes
    * rows) + a map-side-combined σ sum — the BSP shape q_pagerank
    * uses; the backward joins are frontier-sized. Only the hop-0 seed
    * (4 constant roots) carries a broadcast hint; deeper frontiers
    * grow with the graph, so AQE picks broadcast vs shuffle from
    * runtime sizes (VERDICT r12 #4). Depth and source counts are
    * fixed constants, so total work is O(levels · E) like any BSP
    * pass.
    */
  private val betweenness = QueryDef(
    "q_betweenness",
    "Source-sampled betweenness centrality over the trade graph: " +
      "level-synchronous Brandes from 4 fixed supplier sources, depth " +
      "3, exact-BIGINT path counts and 9-grid decimal-summed " +
      "dependencies; top-20 broker nodes.",
    Some("""WITH pairs AS (SELECT DISTINCT o_custkey AS c, 100000 + l_suppkey AS sup
           |               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |ed AS (SELECT c AS src, sup AS dst FROM pairs
           |       UNION ALL SELECT sup, c FROM pairs),
           |l0 AS (SELECT r AS root, r AS node, CAST(1 AS BIGINT) AS sigma
           |       FROM (SELECT unnest([100001, 100002, 100003, 100004]) AS r)),
           |l1 AS (SELECT a.root, a.node, CAST(sum(a.s) AS BIGINT) AS sigma FROM (
           |         SELECT l0.root, e.dst AS node, l0.sigma AS s
           |         FROM l0 JOIN ed e ON e.src = l0.node) a
           |       LEFT JOIN l0 v ON v.root = a.root AND v.node = a.node
           |       WHERE v.node IS NULL GROUP BY 1, 2),
           |vis1 AS (SELECT root, node FROM l0 UNION ALL SELECT root, node FROM l1),
           |l2 AS (SELECT a.root, a.node, CAST(sum(a.s) AS BIGINT) AS sigma FROM (
           |         SELECT l1.root, e.dst AS node, l1.sigma AS s
           |         FROM l1 JOIN ed e ON e.src = l1.node) a
           |       LEFT JOIN vis1 v ON v.root = a.root AND v.node = a.node
           |       WHERE v.node IS NULL GROUP BY 1, 2),
           |vis2 AS (SELECT root, node FROM vis1 UNION ALL SELECT root, node FROM l2),
           |l3 AS (SELECT a.root, a.node, CAST(sum(a.s) AS BIGINT) AS sigma FROM (
           |         SELECT l2.root, e.dst AS node, l2.sigma AS s
           |         FROM l2 JOIN ed e ON e.src = l2.node) a
           |       LEFT JOIN vis2 v ON v.root = a.root AND v.node = a.node
           |       WHERE v.node IS NULL GROUP BY 1, 2),
           |d2 AS (SELECT v.root, v.node,
           |         CAST(sum(CAST(round(CAST(v.sigma AS DOUBLE) / w.sigma, 9) AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS delta
           |       FROM l2 v JOIN ed e ON e.src = v.node
           |       JOIN l3 w ON w.root = v.root AND w.node = e.dst
           |       GROUP BY 1, 2),
           |d1 AS (SELECT v.root, v.node,
           |         CAST(sum(CAST(round(CAST(v.sigma AS DOUBLE) / w.sigma
           |           * (1 + CAST(coalesce(dw.delta, 0) AS DOUBLE)), 9) AS DECIMAL(38,9))) AS DECIMAL(38,9)) AS delta
           |       FROM l1 v JOIN ed e ON e.src = v.node
           |       JOIN l2 w ON w.root = v.root AND w.node = e.dst
           |       LEFT JOIN d2 dw ON dw.root = w.root AND dw.node = w.node
           |       GROUP BY 1, 2)
           |SELECT node, round(CAST(sum(delta) AS DOUBLE), 6) AS bc
           |FROM (SELECT root, node, delta FROM d1
           |      UNION ALL SELECT root, node, delta FROM d2)
           |GROUP BY 1 ORDER BY bc DESC, node LIMIT 20""".stripMargin),
    (s, d) => {
      import s.implicits._
      val dec = org.apache.spark.sql.types.DecimalType(38, 9)
      val e = edges(s, d).persist()
      val l0 = Seq(100001L, 100002L, 100003L, 100004L)
        .map(r => (r, r, 1L)).toDF("root", "node", "sigma")
      // one BSP level: frontier × edge join, per-root anti join
      // against the visited set, map-side-combined sigma sum. The
      // broadcast hint is applied ONLY to the hop-0 seed (4 constant
      // roots — bounded by construction); deeper frontiers grow with
      // the graph (a 2-hop frontier from hub suppliers approaches
      // customer cardinality at 100× data), so they carry no hint and
      // AQE broadcasts when the runtime size is small, shuffles when
      // it is not (VERDICT r12 #4 — a forced driver-side broadcast of
      // a node-sized frontier is the OOM, not the join itself)
      def expand(lvl: org.apache.spark.sql.DataFrame,
                 vis: org.apache.spark.sql.DataFrame,
                 hintBounded: Boolean) = {
        val f = if (hintBounded) broadcast(lvl) else lvl
        f.join(e, lvl("node") === e("src"))
          .select(col("root"), col("dst").as("node"), col("sigma").as("sg"))
          .join(vis, Seq("root", "node"), "left_anti")
          .groupBy("root", "node")
          .agg(lng(sum(col("sg"))).as("sigma"))
      }
      val vis0 = l0.select("root", "node")
      val l1 = expand(l0, vis0, hintBounded = true).persist()
      val vis1 = vis0.unionAll(l1.select("root", "node"))
      val l2 = expand(l1, vis1, hintBounded = false).persist()
      val vis2 = vis1.unionAll(l2.select("root", "node"))
      val l3 = expand(l2, vis2, hintBounded = false).persist()
      // dependency back-propagation: per level, one frontier-sized
      // join; terms 9-grid rounded, summed as exact decimal
      def deltas(lvlV: org.apache.spark.sql.DataFrame,
                 lvlW: org.apache.spark.sql.DataFrame,
                 deltaW: Option[org.apache.spark.sql.DataFrame]) = {
        val w0 = (deltaW match {
          case Some(dw) => lvlW.join(dw.withColumnRenamed("delta", "wd"),
              Seq("root", "node"), "left")
            .select(col("root").as("wroot"), col("node").as("wnode"),
              col("sigma").as("wsig"),
              coalesce(col("wd"), lit(0).cast(dec)).as("wdelta"))
          case None => lvlW.select(col("root").as("wroot"),
            col("node").as("wnode"), col("sigma").as("wsig"),
            lit(0).cast(dec).as("wdelta"))
        })
        // no hint: the backward frontier is a forward level (graph-
        // growing) — AQE picks broadcast vs shuffle from runtime size
        lvlV
          .join(e, lvlV("node") === e("src"))
          .select(col("root"), col("node"), col("sigma"), col("dst"))
          .join(w0, col("wnode") === col("dst") && col("wroot") === col("root"))
          .select(col("root"), col("node"),
            round(dbl(col("sigma")) / col("wsig")
              * (lit(1.0) + dbl(col("wdelta"))), 9).cast(dec).as("term"))
          .groupBy("root", "node")
          .agg(sum(col("term")).as("delta"))
      }
      val d2 = deltas(l2, l3, None).persist()
      val d1 = deltas(l1, l2, Some(d2))
      d1.unionAll(d2)
        .groupBy("node")
        .agg(round(dbl(sum(col("delta"))), 6).as("bc"))
        .orderBy(col("bc").desc, col("node"))
        .limit(20)
        .transform(materializeThenRelease(_, e, l1, l2, l3, d2))
        .orderBy(col("bc").desc, col("node"))
    }
  )

  // ------------------------------------------------------------------- sssp

  private val sssp = QueryDef(
    "q_sssp",
    "Weighted single-source shortest paths over the trade graph — the " +
      "missing classic next to q_khop (unweighted reach) and " +
      "q_betweenness (all-pairs centrality): edge weight (src+dst) " +
      "mod 7 + 1, source = the minimum ordering customer, distances " +
      "after exactly 6 Bellman-Ford relaxation rounds (a Δ-bounded " +
      "contract, not a convergence loop — both engines run the " +
      "IDENTICAL round count, so the semantics are engine-exact even " +
      "on graphs whose diameter exceeds the bound). Per relaxation " +
      "round: ONE co-partitioned join of the node-sized distance " +
      "table against the src-partitioned persisted edge list + one " +
      "map-side-combined min per destination; state materializes via " +
      "localCheckpoint so round k+1 never re-executes round k's " +
      "lineage (the q_kcore discipline). NO forced broadcast of the " +
      "growing distance table (VERDICT r12 #4 frontier rule — AQE " +
      "broadcasts while it is small, shuffles when it is not). " +
      "Distances are exact BIGINTs; output is the per-side distance " +
      "spectrum (counts + min witness node), bounded by 6·max-weight " +
      "rows. The oracle unrolls the same 6 relaxations as chained " +
      "CTEs.",
    Some("""WITH pairs AS (SELECT DISTINCT o_custkey AS c, 100000 + l_suppkey AS sup
           |               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |e0 AS (SELECT c AS src, sup AS dst FROM pairs UNION ALL SELECT sup, c FROM pairs),
           |e AS (SELECT src, dst, (src + dst) % 7 + 1 AS w FROM e0),
           |d0 AS (SELECT min(o_custkey) AS node, 0 AS dist FROM orders),
           |d1 AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT * FROM d0 UNION ALL
           |    SELECT e.dst AS node, d0.dist + e.w AS dist FROM d0 JOIN e ON e.src = d0.node) GROUP BY 1),
           |d2 AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT * FROM d1 UNION ALL
           |    SELECT e.dst AS node, d1.dist + e.w AS dist FROM d1 JOIN e ON e.src = d1.node) GROUP BY 1),
           |d3 AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT * FROM d2 UNION ALL
           |    SELECT e.dst AS node, d2.dist + e.w AS dist FROM d2 JOIN e ON e.src = d2.node) GROUP BY 1),
           |d4 AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT * FROM d3 UNION ALL
           |    SELECT e.dst AS node, d3.dist + e.w AS dist FROM d3 JOIN e ON e.src = d3.node) GROUP BY 1),
           |d5 AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT * FROM d4 UNION ALL
           |    SELECT e.dst AS node, d4.dist + e.w AS dist FROM d4 JOIN e ON e.src = d4.node) GROUP BY 1),
           |d6 AS (SELECT node, min(dist) AS dist FROM (
           |    SELECT * FROM d5 UNION ALL
           |    SELECT e.dst AS node, d5.dist + e.w AS dist FROM d5 JOIN e ON e.src = d5.node) GROUP BY 1)
           |SELECT CASE WHEN node < 100000 THEN 'customer' ELSE 'supplier' END AS side,
           |       CAST(dist AS BIGINT) AS dist, CAST(count(*) AS BIGINT) AS n_nodes,
           |       CAST(min(node) AS BIGINT) AS min_node
           |FROM d6 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, d) => {
      val nShuffle = s.conf.get("spark.sql.shuffle.partitions").toInt
      val e = edges(s, d)
        .select(col("src"), col("dst"),
          (pmod(col("src") + col("dst"), lit(7L)) + 1L).as("w"))
        .repartition(nShuffle, col("src"))
        .persist()
      e.count()
      // single-value driver read (bounded O(1) by construction): the root
      val root = orders(s, d).agg(min(col("o_custkey"))).head().getLong(0)
      var dist = s.range(1)
        .select(lit(root).as("node"), lit(0L).as("dist"))
        .localCheckpoint(true)
      for (_ <- 1 to 6) {
        val relaxed = dist.join(e, col("node") === col("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        dist = dist.unionByName(relaxed)
          .groupBy("node").agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
      }
      val out = dist
        .select(when(col("node") < 100000L, lit("customer"))
          .otherwise(lit("supplier")).as("side"), col("dist"), col("node"))
        .groupBy("side", "dist")
        .agg(lng(count(lit(1))).as("n_nodes"), lng(min(col("node"))).as("min_node"))
        .orderBy("side", "dist")
      materializeThenRelease(out, e)
    }
  )

  /** One SYNCHRONOUS Louvain local-move round: every node evaluates,
    * against the SAME incoming community assignment, the exact
    * modularity gain of joining each neighbor community (or staying),
    * and the argmax wins. The gain of moving node i into community C
    * is ΔQ = k_in(i,C\i)/m − k_i·Σtot(C\i)/(2m²); scaling by the
    * positive constant 2m² gives the INTEGER score
    * 2m·k_in − k_i·Σtot' — so move selection is exact BIGINT
    * arithmetic, bit-identical across engines, partitionings and
    * retries (the microrank discipline applied to community
    * detection). Σtot' subtracts k_i when C is i's own community
    * (i must not count against itself); the stay candidate is always
    * present via a zero-weight union. Tiebreak: (score DESC, c ASC).
    *
    * Shape per round: one edge⋈community join + a (node, community)
    * count (map-side combined), a community-sized degree rollup, and
    * a per-node argmax window — everything key-partitioned, nothing
    * quadratic; m broadcasts as one row.
    */
  private[graft] def louvainRound(e2: DataFrame, deg: DataFrame, m: DataFrame,
      comm: DataFrame): DataFrame = {
    // comm/deg are NODE-sized and tot is COMMUNITY-sized — all orders
    // of magnitude below the edge list, so they ride broadcasts and
    // the edge-sized stream is never shuffled for a join: the only
    // exchanges per round are the two map-side-combined aggregations
    // (the q_pagerank broadcast-regime argument; at a node count where
    // these outgrow broadcast, drop the hints and the joins degrade to
    // the co-partitioned regime with the same arithmetic)
    val wic = e2.join(broadcast(comm.select(col("i").as("dst"), col("c"))), "dst")
      .groupBy(col("src").as("i"), col("c"))
      .agg(lng(count(lit(1))).as("w"))
    val tot = comm.join(broadcast(deg), "i")
      .groupBy("c").agg(lng(sum(col("k"))).as("tot"))
    // stay candidate as a zero-weight row; if i also has intra-
    // community edges the (i, c_self) pair appears TWICE (w > 0 and
    // w = 0) — harmless, the struct max keeps the higher-score copy,
    // so no dedup shuffle is spent on it
    val cands = wic
      .unionByName(comm.select(col("i"), col("c"), lit(0L).as("w")))
    val selfC = comm.select(col("i"), col("c").as("c_self"))
    cands
      .join(broadcast(deg), "i")
      .join(broadcast(selfC), "i")
      .join(broadcast(tot), "c")
      .crossJoin(broadcast(m))
      .withColumn("score", lit(2L) * col("m") * col("w") -
        col("k") * (col("tot") -
          when(col("c") === col("c_self"), col("k")).otherwise(lit(0L))))
      // argmax by (score DESC, c ASC) as a MAP-SIDE-COMBINABLE struct
      // max (lexicographic; -c flips the tiebreak) — each task reduces
      // its candidates to one row per node before the exchange, where
      // a row_number window would sort whole partitions
      .groupBy("i")
      .agg(max(struct(col("score"), (-col("c")).as("negc"))).as("b"))
      .select(col("i"), (-col("b.negc")).as("c"))
  }

  /** The round template as a DuckDB CTE block, parameterized by the
    * incoming community CTE name — spliced twice so the two engines'
    * rounds cannot drift. `materialized` pins the round's output CTE
    * as MATERIALIZED — required once a THIRD level stacks on top
    * (q_louvain_coarse): un-materialized, every downstream reference
    * re-expands the whole round chain and DuckDB's plan explodes
    * multiplicatively (observed OOM at sf0.001).
    */
  private def louvainRoundDuck(n: Int, inComm: String,
      materialized: Boolean = false): String =
    s"""w$n AS (SELECT e2.src AS i, cm.c AS c, CAST(count(*) AS BIGINT) AS w
       |        FROM e2 JOIN $inComm cm ON cm.i = e2.dst GROUP BY 1, 2),
       |t$n AS (SELECT cm.c AS c, CAST(sum(deg.k) AS BIGINT) AS tot
       |        FROM $inComm cm JOIN deg ON deg.i = cm.i GROUP BY 1),
       |cand$n AS (SELECT i, c, max(w) AS w FROM (
       |  SELECT i, c, w FROM w$n
       |  UNION ALL SELECT i, c, CAST(0 AS BIGINT) AS w FROM $inComm) GROUP BY 1, 2),
       |sc$n AS (SELECT cand$n.i, cand$n.c,
       |          2 * m.m * cand$n.w - deg.k *
       |            (t$n.tot - CASE WHEN cand$n.c = cm.c THEN deg.k ELSE 0 END) AS score
       |         FROM cand$n JOIN deg ON deg.i = cand$n.i
       |         JOIN $inComm cm ON cm.i = cand$n.i
       |         JOIN t$n ON t$n.c = cand$n.c CROSS JOIN m),
       |c$n AS ${if (materialized) "MATERIALIZED " else ""}(SELECT i, c FROM (
       |  SELECT i, c, row_number() OVER (PARTITION BY i ORDER BY score DESC, c) AS rn
       |  FROM sc$n) WHERE rn = 1)""".stripMargin

  private val louvain = QueryDef(
    "q_louvain",
    "Two synchronous Louvain local-move rounds from singleton " +
      "communities over the customer-supplier trade graph (the " +
      "bipartite graph q_pagerank ranks — sparse enough to carry " +
      "real community structure, unlike the near-complete co-part " +
      "graph): per node the exact integer modularity-gain score " +
      "2m*k_in - k_i*Sigma_tot' decides the argmax move, stay " +
      "candidate included, ties to the lowest community id; output " +
      "per node its degree and the communities after rounds 1 and 2.",
    Some(s"""WITH pairs AS (SELECT DISTINCT o_custkey AS s1, 100000 + l_suppkey AS s2
            |               FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
            |e2 AS (SELECT s1 AS src, s2 AS dst FROM pairs UNION ALL SELECT s2, s1 FROM pairs),
            |deg AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS k FROM e2 GROUP BY 1),
            |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
            |c0 AS (SELECT i, i AS c FROM deg),
            |${louvainRoundDuck(1, "c0")},
            |${louvainRoundDuck(2, "c1")}
            |SELECT CAST(deg.i AS BIGINT) AS node, deg.k AS degree,
            |       CAST(c1.c AS BIGINT) AS comm1, CAST(c2.c AS BIGINT) AS comm2
            |FROM deg JOIN c1 ON c1.i = deg.i JOIN c2 ON c2.i = deg.i
            |ORDER BY node""".stripMargin),
    (s, d) => {
      val pairs = orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(when(col("o_custkey") < 100000L, col("o_custkey"))
          .otherwise(raise_error(lit(
            "graph node namespace collision: o_custkey >= 100000"))).as("s1"),
          (col("l_suppkey") + 100000L).as("s2"))
        .distinct()
        .persist() // m + both directions of e2 + two rounds
      val e2 = pairs.select(col("s1").as("src"), col("s2").as("dst"))
        .unionByName(pairs.select(col("s2").as("src"), col("s1").as("dst")))
        .persist()
      val deg = e2.groupBy(col("src").as("i"))
        .agg(lng(count(lit(1))).as("k")).persist()
      val m = pairs.agg(lng(count(lit(1))).as("m"))
      val c0 = deg.select(col("i"), col("i").as("c"))
      val c1 = louvainRound(e2, deg, m, c0).localCheckpoint()
      val c2 = louvainRound(e2, deg, m, c1)
      val out = deg
        .join(c1.withColumnRenamed("c", "comm1"), "i")
        .join(c2.withColumnRenamed("c", "comm2"), "i")
        .select(lng(col("i")).as("node"), col("k").as("degree"),
          lng(col("comm1")).as("comm1"), lng(col("comm2")).as("comm2"))
        .orderBy("node")
      materializeThenRelease(out, pairs, e2, deg)
    }
  )

  /** One WEIGHTED synchronous local-move round — [[louvainRound]]
    * generalized to a weighted edge list (src, dst, w), which is what
    * the contraction step produces. Differences from the unweighted
    * template: k_in sums weights instead of counting rows, self-loops
    * (the contracted intra-community mass) are excluded from the
    * neighbor-community stream (a node's self-loop moves WITH it, so
    * it never scores a destination) but their weight stays in k_i (the
    * doubled edge list counts each intra pair twice, so summing row
    * weights per src reproduces the standard 2·w_self degree term
    * exactly). Scores stay pure BIGINT: weights are counts, m is the
    * original pair count (contraction preserves total weight).
    */
  private[graft] def louvainRoundW(ce: DataFrame, deg: DataFrame, m: DataFrame,
      comm: DataFrame): DataFrame = {
    val wic = ce.filter(col("src") =!= col("dst"))
      .join(broadcast(comm.select(col("i").as("dst"), col("c"))), "dst")
      .groupBy(col("src").as("i"), col("c"))
      .agg(lng(sum(col("w"))).as("w"))
    val tot = comm.join(broadcast(deg), "i")
      .groupBy("c").agg(lng(sum(col("k"))).as("tot"))
    val cands = wic
      .unionByName(comm.select(col("i"), col("c"), lit(0L).as("w")))
    val selfC = comm.select(col("i"), col("c").as("c_self"))
    cands
      .join(broadcast(deg), "i")
      .join(broadcast(selfC), "i")
      .join(broadcast(tot), "c")
      .crossJoin(broadcast(m))
      .withColumn("score", lit(2L) * col("m") * col("w") -
        col("k") * (col("tot") -
          when(col("c") === col("c_self"), col("k")).otherwise(lit(0L))))
      .groupBy("i")
      .agg(max(struct(col("score"), (-col("c")).as("negc"))).as("b"))
      .select(col("i"), (-col("b.negc")).as("c"))
  }

  /** Hierarchical Louvain (VERDICT r14 #6): the contraction step that
    * gives Louvain its power. Two synchronous node-level local-move
    * rounds (the q_louvain template), then the community graph is
    * COARSENED — every community becomes one meta-node, edges re-keyed
    * to community ids with weights summed (intra-community mass lands
    * on self-loops) — and a third, WEIGHTED local-move round runs on
    * the contracted graph, where a single argmax move relocates an
    * entire community at once: the moves a node-level round cannot
    * express. Meta-assignments project back through the level-2
    * mapping. Modularity is invariant under contraction, so meta-graph
    * gains are gains on the original graph.
    *
    * Two deliberate departures from q_louvain:
    *
    *  - **The graph carries planted multi-scale structure**: customers
    *    chain-linked to their 3 nearest same-nation neighbors (25
    *    nation-level communities built from local sub-chains) plus a
    *    sparse deterministic sprinkle of cross-nation edges. The
    *    customer–supplier trade graph q_louvain runs on is
    *    near-structureless at these SFs (its modularity optimum sits
    *    near zero), so synchronous rounds there pile nodes into
    *    Q-NEGATIVE giants — no coarsening level can rescue a partition
    *    Louvain's merge-only moves cannot split (measured and
    *    documented in PLANS.md r15). Hierarchy needs hierarchy to find.
    *  - **The coarse round is Q-GUARDED** (hill-climbing accept rule):
    *    synchronous argmax moves are individually non-negative but can
    *    collectively overshoot (two meta-nodes swapping targets), so
    *    the round computes the EXACT scaled-integer modularity
    *    Q·(2m)² = Σ_C [2m·w_in(C) − tot(C)²] of both the incoming and
    *    the candidate partition on the meta-graph and keeps the
    *    candidate only on STRICT improvement. Q non-decreasing across
    *    levels therefore holds by construction (LouvainSpec pins it,
    *    plus the accept branch at the graded SF and the reject branch
    *    at spec SF — both live paths).
    *
    * Scale: the contracted graph is community-count-sized, orders of
    * magnitude below the edge list — coarsening is one edge-stream
    * aggregation with broadcast endpoint lookups, the guard two
    * meta-graph-sized aggregates, and every later level costs a
    * vanishing fraction of level 0. The weighted template keeps the
    * same integer-exact argmax, so determinism survives the hierarchy.
    */
  private val louvainCoarse = QueryDef(
    "q_louvain_coarse",
    "Hierarchical Louvain with one coarsening level over a planted " +
      "community graph (customers chained to 3 same-nation neighbors " +
      "+ sparse cross-nation edges): two synchronous local-move " +
      "rounds, contraction (edges re-keyed to community ids, weights " +
      "summed, intra mass on self-loops), then a weighted meta-round " +
      "with the same exact integer gain, accepted only if the exact " +
      "scaled modularity strictly improves; per node its degree, " +
      "level-2 community and guarded level-3 community.",
    Some(s"""WITH cust AS (SELECT c_custkey AS ck, c_nationkey AS nk,
            |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
            |  FROM customer),
            |pairs AS (
            |  SELECT a.ck AS s1, b.ck AS s2 FROM cust a JOIN cust b
            |    ON a.nk = b.nk AND b.rn - a.rn BETWEEN 1 AND 3
            |  UNION ALL
            |  SELECT a.ck, b.ck FROM cust a JOIN cust b ON b.ck = a.ck + 1
            |   WHERE a.nk <> b.nk AND (a.ck + b.ck) % 7 = 0),
            |e2 AS (SELECT s1 AS src, s2 AS dst FROM pairs UNION ALL SELECT s2, s1 FROM pairs),
            |deg AS (SELECT src AS i, CAST(count(*) AS BIGINT) AS k FROM e2 GROUP BY 1),
            |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pairs),
            |c0 AS (SELECT i, i AS c FROM deg),
            |${louvainRoundDuck(1, "c0", materialized = true)},
            |${louvainRoundDuck(2, "c1", materialized = true)},
            |ce AS MATERIALIZED (SELECT cs.c AS src, cd.c AS dst, CAST(count(*) AS BIGINT) AS w
            |       FROM e2 JOIN c2 cs ON cs.i = e2.src JOIN c2 cd ON cd.i = e2.dst
            |       GROUP BY 1, 2),
            |degc AS MATERIALIZED (SELECT src AS i, CAST(sum(w) AS BIGINT) AS k FROM ce GROUP BY 1),
            |mc0 AS MATERIALIZED (SELECT i, i AS c FROM degc),
            |w3 AS (SELECT ce.src AS i, cm.c AS c, CAST(sum(ce.w) AS BIGINT) AS w
            |       FROM ce JOIN mc0 cm ON cm.i = ce.dst WHERE ce.src <> ce.dst GROUP BY 1, 2),
            |t3 AS (SELECT cm.c AS c, CAST(sum(degc.k) AS BIGINT) AS tot
            |       FROM mc0 cm JOIN degc ON degc.i = cm.i GROUP BY 1),
            |cand3 AS (SELECT i, c, max(w) AS w FROM (
            |  SELECT i, c, w FROM w3
            |  UNION ALL SELECT i, c, CAST(0 AS BIGINT) AS w FROM mc0) GROUP BY 1, 2),
            |sc3 AS (SELECT cand3.i, cand3.c,
            |         2 * m.m * cand3.w - degc.k *
            |           (t3.tot - CASE WHEN cand3.c = cm.c THEN degc.k ELSE 0 END) AS score
            |        FROM cand3 JOIN degc ON degc.i = cand3.i
            |        JOIN mc0 cm ON cm.i = cand3.i
            |        JOIN t3 ON t3.c = cand3.c CROSS JOIN m),
            |c3m AS MATERIALIZED (SELECT i, c FROM (
            |  SELECT i, c, row_number() OVER (PARTITION BY i ORDER BY score DESC, c) AS rn
            |  FROM sc3) WHERE rn = 1),
            |q2 AS MATERIALIZED (SELECT 2 * m.m * COALESCE((SELECT sum(w) FROM ce WHERE src = dst), 0)
            |         - (SELECT sum(k * k) FROM degc) AS q FROM m),
            |q3 AS MATERIALIZED (SELECT 2 * m.m * (SELECT COALESCE(sum(ce.w), 0) FROM ce
            |           JOIN c3m ca ON ca.i = ce.src JOIN c3m cb ON cb.i = ce.dst
            |           WHERE ca.c = cb.c)
            |         - (SELECT sum(tot * tot) FROM (
            |             SELECT CAST(sum(degc.k) AS BIGINT) AS tot FROM degc
            |             JOIN c3m ON c3m.i = degc.i GROUP BY c3m.c)) AS q FROM m),
            |accept AS (SELECT q3.q > q2.q AS ok FROM q2 CROSS JOIN q3)
            |SELECT CAST(deg.i AS BIGINT) AS node, deg.k AS degree,
            |       CAST(c2.c AS BIGINT) AS comm2,
            |       CAST(CASE WHEN accept.ok THEN c3m.c ELSE c2.c END AS BIGINT) AS comm3
            |FROM deg JOIN c2 ON c2.i = deg.i JOIN c3m ON c3m.i = c2.c
            |CROSS JOIN accept
            |ORDER BY node""".stripMargin),
    (s, d) => {
      val parts = louvainCoarseParts(s, d)
      parts._1
    }
  )

  /** The level frames behind q_louvain_coarse, exposed so LouvainSpec
    * can compute modularity per level. Returns (out, e2, m,
    * Seq(c1, c2, c3-projected-and-guarded)).
    */
  private[graft] def louvainCoarseParts(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame, Seq[DataFrame]) = {
    // custkeys are dense from 0 (the TPC-H convention, asserted by the
    // rn == ck + 1 relation the oracle shares), so the global-adjacency
    // cross edges join on ck + 1 directly — no unpartitioned window
    val wNat = Window.partitionBy("nk").orderBy("ck")
    val cust = customer(s, d)
      .select(col("c_custkey").as("ck"), col("c_nationkey").as("nk"))
      .withColumn("rn", row_number().over(wNat))
      .persist()
    val a = cust.select(col("ck").as("ack"), col("nk").as("ank"),
      col("rn").as("arn"))
    val chain = a.join(cust,
        col("ank") === col("nk") &&
          (col("rn") - col("arn")).between(1, 3))
      .select(col("ack").as("s1"), col("ck").as("s2"))
    val cross = a.join(cust, col("ck") === col("ack") + 1)
      .filter(col("ank") =!= col("nk") &&
        pmod(col("ack") + col("ck"), lit(7L)) === 0)
      .select(col("ack").as("s1"), col("ck").as("s2"))
    val pairs = chain.unionByName(cross).persist()
    val e2 = pairs.select(col("s1").as("src"), col("s2").as("dst"))
      .unionByName(pairs.select(col("s2").as("src"), col("s1").as("dst")))
      .persist()
    val deg = e2.groupBy(col("src").as("i"))
      .agg(lng(count(lit(1))).as("k")).persist()
    val m = pairs.agg(lng(count(lit(1))).as("m"))
    val c0 = deg.select(col("i"), col("i").as("c"))
    val c1 = louvainRound(e2, deg, m, c0).localCheckpoint()
    val c2 = louvainRound(e2, deg, m, c1).localCheckpoint()
    // ---- contraction: one edge-stream aggregation; both endpoint
    // lookups broadcast (node-sized vs edge-sized)
    val ce = e2
      .join(broadcast(c2.select(col("i").as("src"), col("c").as("cs"))), "src")
      .join(broadcast(c2.select(col("i").as("dst"), col("c").as("cd"))), "dst")
      .groupBy(col("cs").as("src"), col("cd").as("dst"))
      .agg(lng(count(lit(1))).as("w"))
      .localCheckpoint()
    val degc = ce.groupBy(col("src").as("i")).agg(lng(sum(col("w"))).as("k"))
      .localCheckpoint()
    val mc0 = degc.select(col("i"), col("i").as("c"))
    val c3meta = louvainRoundW(ce, degc, m, mc0).localCheckpoint()
    // ---- Q-guard: exact scaled modularity of the incoming (singleton
    // meta) and candidate partitions, both meta-graph-sized aggregates
    val q2 = ce.filter(col("src") === col("dst"))
      .agg(coalesce(sum(col("w")), lit(0L)).as("win"))
      .crossJoin(degc.agg(sum(col("k") * col("k")).as("kk")))
      .crossJoin(m)
      .select((lit(2L) * col("m") * col("win") - col("kk")).as("q2"))
    val q3 = ce
      .join(broadcast(c3meta.select(col("i").as("src"), col("c").as("ca"))), "src")
      .join(broadcast(c3meta.select(col("i").as("dst"), col("c").as("cb"))), "dst")
      .filter(col("ca") === col("cb"))
      .agg(coalesce(sum(col("w")), lit(0L)).as("win"))
      .crossJoin(degc.join(broadcast(c3meta), "i")
        .groupBy("c").agg(sum(col("k")).as("tot"))
        .agg(sum(col("tot") * col("tot")).as("kk")))
      .crossJoin(m)
      .select((lit(2L) * col("m") * col("win") - col("kk")).as("q3"))
    val accept = q2.crossJoin(q3)
      .select((col("q3") > col("q2")).as("ok"))
    // project the guarded meta-move back to original nodes
    val c3 = c2.join(broadcast(
        c3meta.select(col("i").as("c"), col("c").as("cm3"))), "c")
      .crossJoin(broadcast(accept))
      .select(col("i"),
        when(col("ok"), col("cm3")).otherwise(col("c")).as("c"))
    val out = deg
      .join(c2.withColumnRenamed("c", "comm2"), "i")
      .join(c3.withColumnRenamed("c", "comm3"), "i")
      .select(lng(col("i")).as("node"), col("k").as("degree"),
        lng(col("comm2")).as("comm2"), lng(col("comm3")).as("comm3"))
      .orderBy("node")
    (materializeThenRelease(out, cust, pairs, e2, deg), e2, m, Seq(c1, c2, c3))
  }

  val defs: Seq[QueryDef] = Seq(pagerank, triangles, khop, linkJaccard,
    modularity, hits, labelProp, kcore, randomWalk, betweenness, sssp,
    louvain, louvainCoarse)
}
