package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Remaining TPC-H planner shapes (SURVEY.md §2.13), adapted to the
  * testdata schema (no partsupp table, no commit/receipt dates or
  * ship modes on lineitem — each adaptation keeps the ORIGINAL query's
  * planner exercise and swaps only the unavailable column).
  *
  * With Q1/3/5/6/10/14/17/18/19/21/22 already in Relational.scala this
  * completes every TPC-H shape expressible over the 7 available tables:
  * two-sided nation joins (Q7), market-share case-ratio (Q8), profit
  * with a cost term (Q9), priority case-counts with date arithmetic
  * (Q12), outer-join-with-residual-condition histogram (Q13),
  * aggregate-vs-its-own-max (Q15), NOT-IN anti join under a distinct
  * aggregate (Q16), and majority-share semi join (Q20). Q2/Q11 are
  * partsupp-only and have no faithful adaptation — excluded by design.
  *
  * All money math follows the Det discipline: identical
  * CAST-to-DECIMAL sum expressions in both engines, DOUBLE only at the
  * boundary.
  */
object TpchExtraQueries {

  /** The Q3/Q5 revenue expression — identical text in both engines so
    * the decimal intermediates match bit-for-bit.
    */
  private val RevenueSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"

  private val tpchQ7 = QueryDef(
    "q_tpch_q7",
    "TPC-H Q7-shaped bilateral shipping volume: supplier nation × " +
      "customer nation (NATION_3 ↔ NATION_7, both directions) by ship " +
      "year. Both nation-restricted dimension sides broadcast; the " +
      "only shuffle is the lineitem⋈orders fact join; the year range " +
      "is pushed into the lineitem scan.",
    Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            |       CAST(year(l.l_shipdate) AS INT) AS l_year,
            |       CAST(sum($RevenueSql) AS DOUBLE) AS revenue
            |FROM supplier s
            |JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            |JOIN orders o   ON o.o_orderkey = l.l_orderkey
            |JOIN customer c ON c.c_custkey = o.o_custkey
            |JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
            |JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
            |WHERE n1.n_name IN ('NATION_3', 'NATION_7')
            |  AND n2.n_name IN ('NATION_3', 'NATION_7')
            |  AND n1.n_name <> n2.n_name
            |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
            |  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
            |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
    (s, d) => {
      val names = Seq("NATION_3", "NATION_7")
      val suppDim = supplier(s, d)
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(names: _*))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custDim = customer(s, d)
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(names: _*))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(suppDim), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(custDim), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dbl(sum(expr(RevenueSql))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }
  )

  private val tpchQ8 = QueryDef(
    "q_tpch_q8",
    "TPC-H Q8-shaped national market share: NATION_7's share of ASIA's " +
      "ECONOMY-part purchase volume per order year. The case-ratio " +
      "divides two exact decimal sums AFTER casting each to double " +
      "(one IEEE division — engine-exact). Part, customer-region and " +
      "supplier-nation dims all broadcast; lineitem⋈orders is the one " +
      "shuffle.",
    Some(s"""SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
            |       CAST(sum(CASE WHEN n1.n_name = 'NATION_7' THEN $RevenueSql
            |                     ELSE CAST(0.00 AS DECIMAL(12,4)) END) AS DOUBLE)
            |       / CAST(sum($RevenueSql) AS DOUBLE) AS mkt_share
            |FROM part p
            |JOIN lineitem l ON l.l_partkey = p.p_partkey
            |JOIN orders o   ON o.o_orderkey = l.l_orderkey
            |JOIN customer c ON c.c_custkey = o.o_custkey
            |JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
            |JOIN region r   ON r.r_regionkey = n2.n_regionkey
            |JOIN supplier s ON s.s_suppkey = l.l_suppkey
            |JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
            |WHERE p.p_type = 'ECONOMY' AND r.r_name = 'ASIA'
            |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o.o_orderdate <  TIMESTAMP '1998-01-01'
            |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val p = part(s, d).filter(col("p_type") === "ECONOMY").select("p_partkey")
      val custAsia = customer(s, d)
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      val suppNation = supplier(s, d)
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dbl(sum(expr(s"CASE WHEN n_name = 'NATION_7' THEN $RevenueSql ELSE CAST(0.00 AS DECIMAL(12,4)) END"))) /
          dbl(sum(expr(RevenueSql)))).as("mkt_share"))
        .orderBy("o_year")
    }
  )

  private val tpchQ9 = QueryDef(
    "q_tpch_q9",
    "TPC-H Q9-shaped product-line profit per supplier nation and year " +
      "(adapted: no partsupp, so cost = p_retailprice × l_quantity " +
      "instead of ps_supplycost × l_quantity — same plan, same exact " +
      "decimal arithmetic). Part ('red' products) and supplier-nation " +
      "dims broadcast; profit sums as one decimal expression.",
    Some(s"""SELECT n.n_name AS nation,
            |       CAST(year(o.o_orderdate) AS INT) AS o_year,
            |       CAST(sum($RevenueSql
            |                - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
            |FROM part p
            |JOIN lineitem l ON l.l_partkey = p.p_partkey
            |JOIN supplier s ON s.s_suppkey = l.l_suppkey
            |JOIN nation n   ON n.n_nationkey = s.s_nationkey
            |JOIN orders o   ON o.o_orderkey = l.l_orderkey
            |WHERE p.p_name LIKE '%red%'
            |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin),
    (s, d) => {
      val p = part(s, d).filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      val suppNation = supplier(s, d)
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, d).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(dbl(sum(expr(s"$RevenueSql - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))"))).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }
  )

  private val tpchQ4 = QueryDef(
    "q_tpch_q4",
    "TPC-H Q4-shaped order-priority checking (adapted: no commit/" +
      "receipt dates — 'late' = a lineitem shipped more than 60 days " +
      "after ordering): orders placed in 1996 counted per priority " +
      "when at least one late line EXISTS. The EXISTS compiles to a " +
      "LEFT SEMI join on o_orderkey (each order emitted once however " +
      "many lines are late); the correlated date predicate rides the " +
      "join as a residual; the 1996 filter is pushed into the orders " +
      "scan before the fact-fact shuffle.",
    Some("""SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
           |FROM orders o
           |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
           |  AND EXISTS (SELECT 1 FROM lineitem l
           |              WHERE l.l_orderkey = o.o_orderkey
           |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = lineitem(s, d).select("l_orderkey", "l_shipdate")
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(lng(count(lit(1))).as("order_count"))
        .orderBy("o_orderpriority")
    }
  )

  private val tpchQ12 = QueryDef(
    "q_tpch_q12",
    "TPC-H Q12-shaped priority split (adapted: no l_shipmode/commit/" +
      "receipt dates — groups by l_returnflag and 'late' = shipped " +
      "more than 30 days after ordering). The case-count pair " +
      "aggregates map-side; the date arithmetic is a residual " +
      "predicate on the one fact-fact shuffle join.",
    Some("""SELECT l.l_returnflag,
           |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           |WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      lineitem(s, d).select("l_orderkey", "l_returnflag", "l_shipdate")
        .join(orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(lng(sum(when(isHigh, 1).otherwise(0))).as("high_line_count"),
          lng(sum(when(isHigh, 0).otherwise(1))).as("low_line_count"))
        .orderBy("l_returnflag")
    }
  )

  private val tpchQ13 = QueryDef(
    "q_tpch_q13",
    "TPC-H Q13-shaped customer order-count histogram: LEFT OUTER join " +
      "with a RESIDUAL (non-key) condition — the orders filter must " +
      "ride on the join, not a WHERE (a WHERE would drop zero-order " +
      "customers) — then a two-level aggregate. count(o_orderkey) " +
      "counts only matches; null-extended rows land in bucket 0.",
    Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
           |FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
           |      FROM customer c
           |      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           |                        AND o.o_orderpriority <> '1-URGENT'
           |      GROUP BY 1)
           |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin),
    (s, d) => {
      customer(s, d).select("c_custkey")
        .join(orders(s, d).select("o_custkey", "o_orderkey", "o_orderpriority"),
          col("o_custkey") === col("c_custkey") &&
            col("o_orderpriority") =!= "1-URGENT",
          "left")
        .groupBy("c_custkey")
        .agg(lng(count(col("o_orderkey"))).as("c_count"))
        .groupBy("c_count")
        .agg(lng(count(lit(1))).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }
  )

  private val tpchQ15 = QueryDef(
    "q_tpch_q15",
    "TPC-H Q15-shaped top supplier: quarterly revenue per supplier, " +
      "keep the supplier(s) equal to the global max — the aggregate " +
      "compared against its OWN max. The max is a broadcast single-row " +
      "cross join over the (persisted) revenue frame, so the revenue " +
      "aggregation runs once, not once per row; equality on the exact " +
      "decimal sum is deterministic.",
    Some(s"""WITH rev AS (
            |  SELECT l_suppkey AS supplier_no,
            |         CAST(sum($RevenueSql) AS DOUBLE) AS total_revenue
            |  FROM lineitem
            |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            |    AND l_shipdate <  TIMESTAMP '1997-04-01'
            |  GROUP BY 1)
            |SELECT s.s_suppkey, s.s_name, r.total_revenue
            |FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
            |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
            |ORDER BY s.s_suppkey""".stripMargin),
    (s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dbl(sum(expr(RevenueSql))).as("total_revenue"))
        .persist()
      val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }
  )

  private val tpchQ16 = QueryDef(
    "q_tpch_q16",
    "TPC-H Q16-shaped supplier diversity count (adapted: lineitem " +
      "plays the part-supplier relation — no partsupp). NOT IN " +
      "excluded-supplier subquery becomes an anti join (s_suppkey is " +
      "non-null, so NOT IN ≡ anti); distinct suppliers per part attr " +
      "triple; the distinct aggregate partially de-dups map-side.",
    Some("""SELECT p.p_brand, p.p_type, p.p_size,
           |       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
           |FROM lineitem l
           |JOIN part p ON p.p_partkey = l.l_partkey
           |WHERE p.p_brand <> 'Brand#45'
           |  AND p.p_type NOT LIKE 'MEDIUM%'
           |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
           |  AND l.l_suppkey NOT IN
           |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           |GROUP BY 1, 2, 3
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    (s, d) => {
      val p = part(s, d)
        .filter(col("p_brand") =!= "Brand#45" &&
          !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val excluded = supplier(s, d).filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(lng(countDistinct(col("l_suppkey"))).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }
  )

  private val tpchQ20 = QueryDef(
    "q_tpch_q20",
    "TPC-H Q20-shaped majority-share suppliers (adapted: no partsupp " +
      "availqty, so the threshold is 'shipped more than half of a " +
      "small-part's 1997 volume'). One aggregate per (part, supplier), " +
      "the per-part total via a window over the SAME aggregate (no " +
      "second scan), exact decimal 2×share > total comparison, then a " +
      "distinct semi join into supplier.",
    Some("""WITH sp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
           |q AS (SELECT l_partkey, l_suppkey,
           |             sum(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
           |      FROM lineitem JOIN sp ON p_partkey = l_partkey
           |      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           |        AND l_shipdate <  TIMESTAMP '1998-01-01'
           |      GROUP BY 1, 2),
           |w AS (SELECT *, sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
           |      FROM q)
           |SELECT s.s_suppkey, s.s_name, s.s_acctbal
           |FROM supplier s
           |WHERE s.s_suppkey IN (SELECT l_suppkey FROM w
           |                      WHERE 2 * supp_qty > part_qty)
           |ORDER BY s.s_suppkey""".stripMargin),
    (s, d) => {
      val sp = part(s, d).filter(col("p_name").like("small%"))
        .select("p_partkey")
      val q = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(sp), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(money(col("l_quantity"))).as("supp_qty"))
      val w = q.withColumn("part_qty",
        sum(col("supp_qty")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))))
      val majority = w.filter(lit(2) * col("supp_qty") > col("part_qty"))
        .select("l_suppkey")
      supplier(s, d)
        .join(majority, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    }
  )

  val defs: Seq[QueryDef] = Seq(tpchQ4, tpchQ7, tpchQ8, tpchQ9, tpchQ12,
    tpchQ13, tpchQ15, tpchQ16, tpchQ20)
}
