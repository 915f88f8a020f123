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
      counts.withColumn("false_positives",
        col("bloom_passed") - col("true_matches"))
    }
  )

  val defs: Seq[QueryDef] = Seq(zorder, bloomJoin)
}
