package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Physical-layout operators (SURVEY.md §2.21): the data-organization
  * side of a 100 TB store. A table this size is only as fast as the
  * fraction of it queries can SKIP — multi-dimensional clustering
  * (Z-order) makes min/max file stats selective on more than one
  * column, and Bloom-filter pre-filtering is the runtime half of the
  * same idea (skip rows, not files, when the probe side is known).
  * Both are pure integer/arithmetic plans: deterministic, codegen-
  * friendly, no UDFs.
  */
object LayoutQueries {

  /** Bit-interleave helper: Σ_i ((c >> i) & 1) << (2i + off), 8 bits. */
  private def spread(c: String, off: Int): String =
    (0 until 8).map(i => s"((($c >> $i) & 1) * ${1L << (2 * i + off)})")
      .mkString(" + ")

  private val zorder = QueryDef(
    "q_zorder",
    "Z-order (Morton) clustering key over (o_totalprice, o_custkey): " +
      "each dimension min/max-quantized to 8 bits, bits interleaved " +
      "into a 16-bit key, top 8 bits = target file bucket. Output is " +
      "the per-bucket min/max data-skipping stats a lakehouse writer " +
      "would persist — adjacent buckets cover tight rectangles in BOTH " +
      "dimensions, which is the whole point of multi-dim clustering " +
      "(a 1-D sort gives tight ranges on one column and useless ones " +
      "on the other). One aggregate for the bounds (broadcast back), " +
      "one scan to key, one aggregate for the stats.",
    Some(s"""WITH b AS (SELECT min(o_totalprice) AS xmin, max(o_totalprice) AS xmax,
            |                  CAST(min(o_custkey) AS DOUBLE) AS ymin,
            |                  CAST(max(o_custkey) AS DOUBLE) AS ymax FROM orders),
            |q AS (SELECT o_orderkey, o_totalprice, o_custkey,
            |        least(255, CAST(floor((o_totalprice - xmin) * 256.0 / (xmax - xmin)) AS BIGINT)) AS xq,
            |        least(255, CAST(floor((CAST(o_custkey AS DOUBLE) - ymin) * 256.0 / (ymax - ymin)) AS BIGINT)) AS yq
            |      FROM orders CROSS JOIN b),
            |z AS (SELECT *, ${spread("xq", 0)} + ${spread("yq", 1)} AS zkey FROM q)
            |SELECT zkey >> 8 AS zbucket, CAST(count(*) AS BIGINT) AS n,
            |       min(o_totalprice) AS price_min, max(o_totalprice) AS price_max,
            |       min(o_custkey) AS cust_min, max(o_custkey) AS cust_max
            |FROM z GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
      val bounds = o.agg(
        min("o_totalprice").as("xmin"), max("o_totalprice").as("xmax"),
        dbl(min("o_custkey")).as("ymin"), dbl(max("o_custkey")).as("ymax"))
      o.crossJoin(broadcast(bounds))
        .withColumn("xq", least(lit(255L),
          floor((col("o_totalprice") - col("xmin")) * lit(256.0) /
            (col("xmax") - col("xmin"))).cast("long")))
        .withColumn("yq", least(lit(255L),
          floor((dbl(col("o_custkey")) - col("ymin")) * lit(256.0) /
            (col("ymax") - col("ymin"))).cast("long")))
        .withColumn("zkey", expr(s"${spread("xq", 0)} + ${spread("yq", 1)}"))
        .groupBy(expr("zkey >> 8").as("zbucket"))
        .agg(lng(count(lit(1))).as("n"),
          min("o_totalprice").as("price_min"), max("o_totalprice").as("price_max"),
          min("o_custkey").as("cust_min"), max("o_custkey").as("cust_max"))
        .orderBy("zbucket")
    }
  )

  private val bloomJoin = QueryDef(
    "q_bloom_join",
    "Bloom-filter runtime pre-filter: 4096-bit filter (2 md5-derived " +
      "hash functions) built from the BUILDING-segment customer keys, " +
      "applied to orders BEFORE the join. Output audits the filter: " +
      "rows passed, true matches, false positives. The semantics of " +
      "Spark's own runtime row-level filtering, made explicit — at " +
      "100 TB the ~KB filter broadcast replaces shuffling the fact " +
      "side of a selective join.",
    Some("""WITH dim AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
           |pos AS (SELECT DISTINCT p FROM (
           |  SELECT CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12)) AS BIGINT) % 4096 AS p FROM dim
           |  UNION ALL
           |  SELECT CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)), 13, 12)) AS BIGINT) % 4096 AS p FROM dim)),
           |f AS (SELECT o_orderkey, o_custkey,
           |        CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12)) AS BIGINT) % 4096 AS h1,
           |        CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 13, 12)) AS BIGINT) % 4096 AS h2
           |      FROM orders),
           |passed AS (SELECT * FROM f WHERE h1 IN (SELECT p FROM pos) AND h2 IN (SELECT p FROM pos)),
           |truth AS (SELECT * FROM f WHERE o_custkey IN (SELECT c_custkey FROM dim))
           |SELECT (SELECT CAST(count(*) AS BIGINT) FROM f) AS total_orders,
           |       (SELECT CAST(count(*) AS BIGINT) FROM pos) AS bits_set,
           |       (SELECT CAST(count(*) AS BIGINT) FROM passed) AS bloom_passed,
           |       (SELECT CAST(count(*) AS BIGINT) FROM truth) AS true_matches,
           |       (SELECT CAST(count(*) AS BIGINT) FROM passed) -
           |       (SELECT CAST(count(*) AS BIGINT) FROM truth) AS false_positives""".stripMargin),
    (s, d) => {
      def h(c: String, o: Int) =
        expr(s"CAST(conv(substr(md5(cast($c as string)), $o, 12), 16, 10) AS BIGINT) % 4096")
      val dim = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val pos = dim.select(h("c_custkey", 1).as("p"))
        .unionAll(dim.select(h("c_custkey", 13).as("p"))).distinct().persist()
      val f = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        h("o_custkey", 1).as("h1"), h("o_custkey", 13).as("h2")).persist()
      val passed = f
        .join(broadcast(pos.withColumnRenamed("p", "h1")), Seq("h1"), "left_semi")
        .join(broadcast(pos.withColumnRenamed("p", "h2")), Seq("h2"), "left_semi")
      val truth = f.join(broadcast(dim.withColumnRenamed("c_custkey", "o_custkey")),
        Seq("o_custkey"), "left_semi")
      val counts = f.agg(lng(count(lit(1))).as("total_orders"))
        .crossJoin(pos.agg(lng(count(lit(1))).as("bits_set")))
        .crossJoin(passed.agg(lng(count(lit(1))).as("bloom_passed")))
        .crossJoin(truth.agg(lng(count(lit(1))).as("true_matches")))
      materializeThenRelease(
        counts.withColumn("false_positives",
          col("bloom_passed") - col("true_matches")),
        f, pos)
    }
  )

  /** Hive-style partitioned layout + static partition pruning — the
    * single biggest scan-cost lever a 100 TB store has: a predicate on
    * the partition column eliminates whole directories BEFORE any file
    * is opened (PartitionFilters in the scan node), while ordinary
    * predicates only prune row groups inside files already listed. The
    * query writes the documents table as a source-partitioned parquet
    * directory (the layout a web-corpus lake actually uses — crawl
    * source is THE first-class list/retention dimension), reads it back
    * with a partition predicate + a residual data predicate, and
    * projects a row-level readout so any loss in the partitioned
    * round trip breaks the hash. PlanSpec pins the split: `source`
    * must appear under PartitionFilters (metadata-only pruning) and
    * n_chars under PushedFilters (parquet row-group pruning) — 2 of
    * 20 directories listed, everything else never touched.
    *
    * DuckDB cannot be pointed at the Hive directory by the driver's
    * fixed FROM-clause contract, so the oracle proves the round trip
    * losslessly the q_scan_orc way: the identical filtered projection
    * straight from the source parquet.
    */
  private val scanPartitioned = QueryDef(
    "q_scan_partitioned",
    "Partitioned-layout scan: write documents partitioned by source, " +
      "read back with a partition predicate (PartitionFilters, " +
      "directory-level pruning) plus a pushed n_chars predicate - " +
      "the oracle recomputes the projection from the source parquet, " +
      "so a lossy partitioned round trip fails the hash.",
    Some("""SELECT doc_id, lang, source,
           |       CAST(length(text) AS BIGINT) AS text_len
           |FROM documents
           |WHERE source IN ('src3', 'src7') AND n_chars >= 300
           |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val outDir = s"/root/repo/target/part_scan/${new java.io.File(d).getName}"
      documents(s, d).write.mode("overwrite")
        .partitionBy("source").parquet(outDir)
      s.read.parquet(outDir)
        .filter(col("source").isin("src3", "src7") && col("n_chars") >= 300)
        .select(col("doc_id"), col("lang"), col("source"),
          lng(length(col("text"))).as("text_len"))
        .orderBy("doc_id")
    }
  )

  /** Dynamic partition pruning (DPP) — the star-schema companion to
    * [[scanPartitioned]]: the fact table is partitioned by order month
    * (`ym`), the filter lives on a DIM table attribute (year/quarter),
    * and the months to scan are only known at runtime, after the dim
    * filter evaluates. Catalyst turns the broadcast dim into a runtime
    * partition predicate on the fact scan
    * (`dynamicpruningexpression(ym IN broadcast-result)`) — at 100 TB
    * this is the difference between scanning 6 months and scanning 80
    * because the planner couldn't see through the join. PlanSpec pins
    * `dynamicpruningexpression` inside the fact scan's
    * PartitionFilters; the dim (80 rows) broadcasts, so the pruning
    * reuses the join's own broadcast (no extra job).
    *
    * Both sides are derived from the orders table (fact = orders
    * repartitioned by month on disk; dim = the distinct month
    * calendar with year/quarter attributes), so the oracle is the
    * equivalent direct filter over the source parquet.
    */
  private val dppJoin = QueryDef(
    "q_dpp_join",
    "Dynamic partition pruning: month-partitioned orders fact joined " +
      "to a calendar dim filtered to 1997 H1 - the dim broadcast " +
      "becomes a runtime PartitionFilter on the fact scan, reading 6 " +
      "of 80 month directories; monthly order counts and exact " +
      "revenue out.",
    Some("""SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           |       CAST(count(*) AS BIGINT) AS n_orders,
           |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM orders
           |WHERE year(o_orderdate) = 1997 AND quarter(o_orderdate) <= 2
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val base = s"/root/repo/target/dpp/${new java.io.File(d).getName}"
      val o = orders(s, d)
        .withColumn("ym", date_format(col("o_orderdate"), "yyyy-MM"))
      o.write.mode("overwrite").partitionBy("ym").parquet(s"$base/fact")
      o.select(col("ym"), year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q")).distinct()
        .write.mode("overwrite").parquet(s"$base/dim")
      val fact = s.read.parquet(s"$base/fact")
      val dim = s.read.parquet(s"$base/dim")
        .filter(col("y") === 1997 && col("q") <= 2)
      fact.join(broadcast(dim), "ym")
        .groupBy("ym")
        .agg(lng(count(lit(1))).as("n_orders"),
          sumMoney(col("o_totalprice")).as("revenue"))
        .orderBy("ym")
    }
  )

  /** Buckets for the pruned lookup table (the q_join_bucketed constant:
    * 8 divides local[32]; hundreds on a cluster — shape, not constant,
    * is what's pinned).
    */
  private val NBuckets = 8

  /** Bucket pruning — the third member of the skip family, completing
    * partition pruning (q_scan_partitioned, directory level) and
    * row-group pruning (PushedFilters, page level): an equality/IN
    * predicate on the BUCKETING column lets the scan open only the
    * buckets those keys hash into (`SelectedBucketsCount: k out of N`
    * in the plan), because bucket membership is decided by the same
    * hash at write time. On the 100 TB co-located fact of
    * q_join_bucketed this is what makes point/IN lookups cheap too:
    * the join layout and the lookup layout are the SAME table, one
    * hash-file per key subset instead of a full scan. The oracle runs
    * the identical filter over the raw parquet — bucketing must not
    * add, drop or alter a single row.
    */
  private val bucketPrune = QueryDef(
    "q_bucket_prune",
    "Bucket pruning: customer IN-lookup on a table bucketed by " +
      "c_custkey opens only the buckets the keys hash into " +
      "(SelectedBucketsCount pinned in PlanSpec); per-key order " +
      "counts + balance out, oracle recomputes from raw parquet.",
    Some("""SELECT c.c_custkey, CAST(c.c_acctbal AS DOUBLE) AS acctbal,
           |       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           |       CAST(sum(CAST(coalesce(o.o_totalprice, 0) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           |WHERE c.c_custkey IN (42, 421, 900)
           |GROUP BY 1, 2 ORDER BY 1""".stripMargin),
    (s, d) => {
      val sfTag = new java.io.File(d).getName.replace('.', '_')
      val tbl = s"graft_cust_bkt_$sfTag"
      if (!s.catalog.tableExists(tbl)) {
        val wh = s.conf.get("spark.sql.warehouse.dir")
        val p = new org.apache.hadoop.fs.Path(s"$wh/$tbl")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        customer(s, d).select(col("c_custkey"), col("c_acctbal"))
          .write.mode("overwrite")
          .bucketBy(NBuckets, "c_custkey").sortBy("c_custkey")
          .saveAsTable(tbl)
      }
      s.table(tbl)
        .filter(col("c_custkey").isin(42, 421, 900))
        .join(orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice")), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(lng(count(col("o_orderkey"))).as("n_orders"),
          dbl(sum(money(coalesce(col("o_totalprice"), lit(0))))).as("revenue"))
        .select(col("c_custkey"), dbl(col("c_acctbal")).as("acctbal"),
          col("n_orders"), col("revenue"))
        .orderBy("c_custkey")
    }
  )

  // -------------------------------------------------------- compaction plan

  private val compactionPlan = QueryDef(
    "q_compaction_plan",
    "Small-file compaction planner — the OPTIMIZE job every lakehouse " +
      "runs against a streaming-ingested landing zone, completing the " +
      "layout family's write side (q_zorder clusters, q_shuffle_shards " +
      "sizes shuffles; this bins FILES): documents modeled as the " +
      "per-source landing files they arrive as (size = n_chars), " +
      "packed in doc_id order into 64 KiB-target output bins by " +
      "cumulative-sum binning — bin = (inclusive running size − 1) " +
      "div target, the streaming-friendly rule whose bins overflow by " +
      "at most one file (exactly how maxRecordsPerFile-style writers " +
      "cut files; true first-fit would need a sequential scan). " +
      "Output per (source, bin): file count, bytes, and the bin's " +
      "doc_id range — everything a rewrite job needs to pick up. All " +
      "exact integer arithmetic. Shape: ONE partitioned running-sum " +
      "window over the skinny (doc_id, n_chars) projection — at " +
      "100 TB the planner never reads data, only the file manifest, " +
      "and each source partition plans independently.",
    Some("""WITH f AS (SELECT source, doc_id, n_chars,
           |             sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
           |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csum
           |           FROM documents)
           |SELECT source, CAST((greatest(csum, 1) - 1) // 65536 AS BIGINT) AS bin,
           |       CAST(count(*) AS BIGINT) AS n_files,
           |       CAST(sum(n_chars) AS BIGINT) AS bytes,
           |       CAST(min(doc_id) AS BIGINT) AS first_doc,
           |       CAST(max(doc_id) AS BIGINT) AS last_doc
           |FROM f GROUP BY 1, 2
           |ORDER BY source, bin""".stripMargin),
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(Long.MinValue, 0)
      documents(s, d).select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("csum", sum(col("n_chars")).over(w))
        .groupBy(col("source"),
          // greatest-guard: a run of zero-size files keeps csum-1 >= 0,
          // where Spark div (truncate) and DuckDB // (floor) agree
          expr("(greatest(csum, 1L) - 1) div 65536").as("bin"))
        .agg(lng(count(lit(1))).as("n_files"),
          lng(sum(col("n_chars"))).as("bytes"),
          lng(min(col("doc_id"))).as("first_doc"),
          lng(max(col("doc_id"))).as("last_doc"))
        .select(col("source"), lng(col("bin")).as("bin"), col("n_files"),
          col("bytes"), col("first_doc"), col("last_doc"))
        .orderBy("source", "bin")
    }
  )

  // ------------------------------------------------------------ spatial_join

  private val spatialJoin = QueryDef(
    "q_spatial_join",
    "Grid-bucketed ε-neighbor spatial join — the 2-D twin of the " +
      "q_dedup_* band discipline and the multi-dim companion to " +
      "q_zorder's clustering key: points (hash-derived integer " +
      "coordinates in [0, 1e6)², ids reduced mod small primes BEFORE " +
      "the Knuth multiply — the overflow rule) pair up when both " +
      "coordinates differ by < ε = 500. THE SCALE SHAPE: candidates " +
      "come from the standard grid join — side A explodes into its " +
      "3×3 neighborhood of ε-cells, side B stays in its home cell, " +
      "and the join is an EQUI-join on the cell key (never all-" +
      "pairs; shuffle fan-in bounded by cell density, which ε " +
      "controls). Each qualifying pair is found EXACTLY once: B's " +
      "home cell is unique among A's nine, and the id ordering picks " +
      "one orientation. Round13Wave2Spec replays a sweep-line brute " +
      "force and proves the grid candidates lossless. Everything " +
      "integer (L∞ distance, exact sums); output is the per-x-band " +
      "pair census.",
    Some("""WITH pts AS (SELECT event_id AS id,
           |               ((event_id % 9973) * 2654435761) % 1000000 AS x,
           |               ((event_id % 7919) * 2654435761) % 1000000 AS y
           |             FROM events),
           |ga AS (SELECT id, x, y, x // 500 + dx AS cx, y // 500 + dy AS cy
           |       FROM pts CROSS JOIN (VALUES (-1),(0),(1)) dxs(dx)
           |                CROSS JOIN (VALUES (-1),(0),(1)) dys(dy)),
           |pairs AS (SELECT a.id AS ida, a.x AS xa, b.id AS idb,
           |            greatest(abs(a.x - b.x), abs(a.y - b.y)) AS dist
           |          FROM ga a JOIN pts b ON a.cx = b.x // 500 AND a.cy = b.y // 500
           |          WHERE a.id < b.id
           |            AND abs(a.x - b.x) < 500 AND abs(a.y - b.y) < 500)
           |SELECT CAST(xa // 100000 AS BIGINT) AS band,
           |       CAST(count(*) AS BIGINT) AS n_pairs,
           |       CAST(sum(dist) AS BIGINT) AS sum_dist,
           |       CAST(min(ida) AS BIGINT) AS min_ida
           |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val pts = events(s, d).select(col("event_id").as("id"),
        expr("((event_id % 9973) * 2654435761) % 1000000").as("x"),
        expr("((event_id % 7919) * 2654435761) % 1000000").as("y"))
      val ga = pts
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("id"), col("x"), col("y"),
          (expr("x DIV 500") + col("dx")).as("cx"),
          (expr("y DIV 500") + col("dy")).as("cy"))
      val b = pts.select(col("id").as("idb"), col("x").as("xb"),
        col("y").as("yb"), expr("x DIV 500").as("bcx"), expr("y DIV 500").as("bcy"))
      val pairs = ga.join(b, col("cx") === col("bcx") && col("cy") === col("bcy"))
        .filter(col("id") < col("idb") &&
          abs(col("x") - col("xb")) < 500 && abs(col("y") - col("yb")) < 500)
        .select(expr("x DIV 100000").as("band"),
          greatest(abs(col("x") - col("xb")), abs(col("y") - col("yb"))).as("dist"),
          col("id"))
      pairs.groupBy("band")
        .agg(lng(count(lit(1))).as("n_pairs"), lng(sum(col("dist"))).as("sum_dist"),
          lng(min(col("id"))).as("min_ida"))
        .orderBy("band")
    }
  )

  val defs: Seq[QueryDef] = Seq(zorder, bloomJoin, scanPartitioned, dppJoin,
    bucketPrune, compactionPlan, spatialJoin)
}
