package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Relational operator inventory (SURVEY.md §2.1–2.4, 2.6, 2.7):
  * scans, projections/filters, every join shape, aggregations,
  * sort/limit/top-k, set operations — all composed from Spark built-ins
  * so Catalyst keeps pushdown, pruning, partial aggregation and join
  * strategy selection (SURVEY.md §4.2).
  *
  * Scale notes (100 TB design intent, verified via .explain on local):
  *  - dimension joins (`part`, `customer`, buckets) use `broadcast()` —
  *    no shuffle of the fact table;
  *  - fact-fact joins shuffle on the join key once and aggregate with
  *    map-side partial aggregation;
  *  - every scan projects only needed columns (parquet column pruning)
  *    and filters early (predicate pushdown into row-group skipping).
  */
object Relational {

  // ---------------------------------------------------------------- scans

  private val scanParquet = QueryDef(
    "q_scan_parquet",
    "Full parquet scan + min/max/count/sum — exercises vectorized read " +
      "and aggregate pushdown-friendly stats.",
    Some("""SELECT count(*) AS n_rows, min(l_orderkey) AS min_key,
           |       max(l_orderkey) AS max_key,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM lineitem""".stripMargin),
    (s, d) =>
      lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"),
        sumMoney(col("l_extendedprice")).as("sum_price"))
  )

  private val scanJsonl = QueryDef(
    "q_scan_jsonl",
    "On-disk JSONL scan (reference rag_chatbot/main.py:8-13): write the " +
      "documents table as JSON lines, read the files back through the " +
      "declared-schema JSON source (no inference), project. The oracle " +
      "reads the SAME files via read_json_auto AND inner-joins them " +
      "field-by-field against the source documents table — a lossy or " +
      "mangling write drops oracle rows and fails the compare, so the " +
      "check is anchored to ground truth, not to whatever both engines " +
      "agree the files say. Output dir is keyed by the sf name so " +
      "correctness (sf0.01) and bench (sf0.1) runs never clobber each " +
      "other.",
    Some("""SELECT f.doc_id, f.lang, f.source, f.n_chars,
           |       CAST(length(f.text) AS BIGINT) AS text_len
           |FROM read_json_auto('/root/repo/target/jsonl_scan/sf0.01/*.json') f
           |JOIN documents d
           |  ON f.doc_id = d.doc_id AND f.text = d.text AND f.lang = d.lang
           | AND f.source = d.source AND f.n_chars = d.n_chars
           |ORDER BY f.doc_id""".stripMargin),
    (s, d) => {
      // eager side effect at construction time: materialize the JSONL dir
      // so both this query's read-back and the DuckDB oracle see the files
      val outDir = s"/root/repo/target/jsonl_scan/${new java.io.File(d).getName}"
      documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").json(outDir)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      s.read.schema(schema).json(outDir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          lng(length(col("text"))).as("text_len"))
        .orderBy("doc_id")
    }
  )

  private val scanCsv = QueryDef(
    "q_scan_csv",
    "On-disk CSV scan: write the documents table as headered CSV " +
      "(RFC-4180 doubled-quote escaping so other engines parse it), " +
      "read the files back with a declared schema (no inference, " +
      "multiLine for quoted embedded newlines), project. The oracle " +
      "reads the SAME files via read_csv and inner-joins them against " +
      "the source documents table — a lossy write fails the compare. " +
      "Dir keyed by sf name like q_scan_jsonl.",
    Some("""SELECT f.doc_id, f.lang, f.source,
           |       CAST(length(f.text) AS BIGINT) AS text_len
           |FROM read_csv('/root/repo/target/csv_scan/sf0.01/*.csv',
           |              header = true,
           |              columns = {'doc_id':'BIGINT','text':'VARCHAR','lang':'VARCHAR','source':'VARCHAR'}) f
           |JOIN documents d
           |  ON f.doc_id = d.doc_id AND f.text = d.text AND f.lang = d.lang
           | AND f.source = d.source
           |ORDER BY f.doc_id""".stripMargin),
    (s, d) => {
      val outDir = s"/root/repo/target/csv_scan/${new java.io.File(d).getName}"
      documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
        .write.mode("overwrite").option("header", "true")
        // RFC-4180 dialect: escape quotes by doubling (Spark's default
        // backslash-escape is a dialect DuckDB's reader doesn't speak)
        .option("escape", "\"").csv(outDir)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, text STRING, lang STRING, source STRING")
      s.read.schema(schema).option("header", "true")
        .option("escape", "\"").option("multiLine", "true").csv(outDir)
        .select(col("doc_id"), col("lang"), col("source"),
          lng(length(col("text"))).as("text_len"))
        .orderBy("doc_id")
    }
  )

  /** ORC round-trip scan — the other columnar format a warehouse
    * actually encounters (Hive-era lakes are ORC; Spark's reader is
    * first-class: vectorized, predicate-pushdown, column-pruned).
    * DuckDB cannot read ORC, so the oracle proves the round trip a
    * different way: it computes the identical filtered projection
    * straight from the source parquet — any loss or corruption in the
    * ORC write+read breaks the hash. The n_chars predicate is applied
    * AFTER the ORC read-back so it must push into the ORC scan
    * (PushedFilters), exercising the reader path that matters at
    * scale, and n_chars itself is excluded from the output so the
    * compare covers the filter's effect, not its storage.
    */
  private val scanOrc = QueryDef(
    "q_scan_orc",
    "ORC scan: write the documents table as ORC, read it back with a " +
      "pushed n_chars predicate, project id/lang/source/text length - " +
      "the oracle computes the same projection from the source " +
      "parquet, so a lossy ORC round trip fails the hash compare.",
    Some("""SELECT doc_id, lang, source,
           |       CAST(length(text) AS BIGINT) AS text_len
           |FROM documents WHERE n_chars >= 500 ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val outDir = s"/root/repo/target/orc_scan/${new java.io.File(d).getName}"
      documents(s, d).write.mode("overwrite").orc(outDir)
      s.read.orc(outDir)
        .filter(col("n_chars") >= 500)
        .select(col("doc_id"), col("lang"), col("source"),
          lng(length(col("text"))).as("text_len"))
        .orderBy("doc_id")
    }
  )

  // ------------------------------------------------- projections / filters

  private val project = QueryDef(
    "q_project",
    "Column projection (reference rag_chatbot/main.py:16-17) — parquet " +
      "scan must read only the three projected columns (ReadSchema).",
    Some("""SELECT c_custkey, c_name, c_mktsegment
           |FROM customer ORDER BY c_custkey""".stripMargin),
    (s, d) => customer(s, d)
      .select("c_custkey", "c_name", "c_mktsegment").orderBy("c_custkey")
  )

  private val filterPred = QueryDef(
    "q_filter_pred",
    "Predicate filter (reference app/main.py:25-26,139) — range + " +
      "comparison predicates, all pushed to the parquet scan.",
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
           |       strftime(l_shipdate, '%Y-%m-%d') AS ship_date
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           |  AND l_shipdate <  TIMESTAMP '1997-01-01'
           |  AND l_discount > 0.05 AND l_quantity < 25
           |ORDER BY l_orderkey, l_linenumber""".stripMargin),
    (s, d) => lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_quantity") < 25)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), dateStr(col("l_shipdate")).as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")
  )

  private val filterNull = QueryDef(
    "q_filter_null",
    "Null/validity filter (reference app/main.py:47,106): synthesize " +
      "corrupt JSON on event_id%7==0, keep only rows whose JSON parses " +
      "— the reference's skip-don't-crash stance.",
    Some("""WITH r AS (
           |  SELECT event_type,
           |         CASE WHEN event_id % 7 = 0 THEN 'x' || props ELSE props END AS raw
           |  FROM events),
           |p AS (
           |  SELECT event_type,
           |         CASE WHEN json_valid(raw)
           |              THEN CAST(json_extract_string(raw, '$.k') AS BIGINT) END AS k
           |  FROM r)
           |SELECT event_type, count(*) AS n_valid, CAST(sum(k) AS BIGINT) AS sum_k
           |FROM p WHERE k IS NOT NULL
           |GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => events(s, d)
      // corruption is *prepended*: Spark's get_json_object is lenient
      // about trailing garbage but rejects a broken prefix, matching
      // DuckDB's json_valid on this shape
      .withColumn("raw", when(col("event_id") % 7 === 0,
        concat(lit("x"), col("props"))).otherwise(col("props")))
      .withColumn("k", get_json_object(col("raw"), "$.k").cast("long"))
      .filter(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_valid"), lng(sum(col("k"))).as("sum_k"))
      .orderBy("event_type")
  )

  private val enrich = QueryDef(
    "q_enrich",
    "Lineage enrichment (reference app/main.py:107-109): computed " +
      "columns + a deterministic global sequence number.",
    Some("""SELECT doc_id, source || '.pdf' AS source_file,
           |       CAST(len(string_split(text, ' ')) AS BIGINT) AS word_count,
           |       n_chars,
           |       CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS seq
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => graft.ops.Sequence.globalSequence(
      documents(s, d)
        .select(col("doc_id"),
          concat(col("source"), lit(".pdf")).as("source_file"),
          lng(size(split(col("text"), " "))).as("word_count"),
          col("n_chars")),
      key = "doc_id", seqName = "seq")
      .orderBy("doc_id")
  )

  // ----------------------------------------------------------------- joins

  private val joinLookup = QueryDef(
    "q_join_lookup",
    "Key lookup join (reference rag_chatbot/main.py:46-47, positional " +
      "ids made explicit): fact→dim fk join; dim side broadcast.",
    Some("""SELECT o.o_orderkey, c.c_name, o.o_totalprice
           |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           |ORDER BY o.o_orderkey""".stripMargin),
    (s, d) => orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy("o_orderkey")
  )

  private val joinBroadcast = QueryDef(
    "q_join_broadcast",
    "Broadcast hash join: lineitem ⋈ part on partkey, dim broadcast — " +
      "zero shuffle of the fact side; revenue per brand.",
    Some("""SELECT p.p_brand, count(*) AS n_items,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
           |                (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
           |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin),
    (s, d) => lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"))).as("revenue"))
      .orderBy("p_brand")
  )

  private val joinSmj = QueryDef(
    "q_join_smj",
    "Large-large sort-merge join (merge hint): lineitem ⋈ orders on " +
      "orderkey — single shuffle on the key, then partial+final agg.",
    Some("""SELECT o.o_orderpriority, count(*) AS n_items,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin),
    (s, d) => lineitem(s, d).hint("merge")
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sumMoney(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  )

  private val joinOuter = QueryDef(
    "q_join_outer",
    "Left outer join preserving order-less customers; aggregates with " +
      "nulls from the unmatched side.",
    Some("""SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           |       CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
           |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
           |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin),
    (s, d) => customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        dbl(coalesce(sum(money(col("o_totalprice"))), lit(0))).as("total_spent"))
      .orderBy("c_custkey")
  )

  /** High-value order threshold: ~p99 of o_totalprice, so that both the
    * semi and anti sets stay non-empty at every scale factor.
    */
  private val HighValue = 490000.0

  private val joinSemi = QueryDef(
    "q_join_semi",
    "Left semi join (EXISTS): customers having at least one high-value order.",
    Some(s"""SELECT c_custkey, c_name FROM customer c
            |WHERE EXISTS (SELECT 1 FROM orders o
            |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > $HighValue)
            |ORDER BY c_custkey""".stripMargin),
    (s, d) => customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > HighValue),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  )

  private val joinAnti = QueryDef(
    "q_join_anti",
    "Left anti join (NOT EXISTS): customers with no high-value order.",
    Some(s"""SELECT c_custkey, c_name FROM customer c
            |WHERE NOT EXISTS (SELECT 1 FROM orders o
            |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > $HighValue)
            |ORDER BY c_custkey""".stripMargin),
    (s, d) => customer(s, d)
      .join(orders(s, d).filter(col("o_totalprice") > HighValue),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name").orderBy("c_custkey")
  )

  private val joinTheta = QueryDef(
    "q_join_theta",
    "Non-equi (range) theta join: lineitem banded by quantity range — " +
      "tiny band table broadcast, so the BNLJ never shuffles the fact side.",
    Some("""WITH bands(band_id, lo, hi) AS (
           |  VALUES (1, 0, 10), (2, 10, 20), (3, 20, 30), (4, 30, 40), (5, 40, 51))
           |SELECT b.band_id, count(*) AS n_items,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM lineitem l JOIN bands b ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
           |GROUP BY b.band_id ORDER BY b.band_id""".stripMargin),
    (s, d) => {
      val bands = s.createDataFrame(Seq(
        (1, 0, 10), (2, 10, 20), (3, 20, 30), (4, 30, 40), (5, 40, 51)))
        .toDF("band_id", "lo", "hi")
      lineitem(s, d)
        .join(broadcast(bands),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("n_items"),
          sumMoney(col("l_extendedprice")).as("sum_price"))
        .orderBy("band_id")
    }
  )

  private val joinAsof = QueryDef(
    "q_join_asof",
    "As-of join: for every purchase event, the latest click by the same " +
      "user at-or-before its timestamp. Implemented Spark-side as " +
      "union + running `last(ignoreNulls)` window — one shuffle by user, " +
      "no range-join blowup (scales linearly, unlike crossJoin+filter). " +
      "Oracle uses the identical gaps-window construction.",
    Some("""WITH ev AS (
           |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
           |  FROM events WHERE event_type IN ('click', 'purchase')),
           |tagged AS (
           |  SELECT *, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind FROM ev),
           |runs AS (
           |  SELECT *,
           |    max(CASE WHEN kind = 0 THEN event_id END)
           |      OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_id,
           |    max(CASE WHEN kind = 0 THEN epoch_us(ts) END)
           |      OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
           |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
           |  FROM tagged)
           |SELECT event_id, user_id, epoch_us(ts) AS ts_us, last_click_id,
           |       epoch_us(ts) - last_click_us AS gap_us
           |FROM runs WHERE kind = 1
           |ORDER BY user_id, ts_us, event_id""".stripMargin),
    (s, d) => {
      val ev = events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_id"), col("ts"), col("user_id"),
          when(col("event_type") === "click", 0).otherwise(1).as("kind"))
      val w = Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // event_id is monotone within a user's click stream, so running max
      // == id of the latest click at-or-before this row (clicks sort
      // before purchases on ties via kind).
      ev.withColumn("last_click_id",
          max(when(col("kind") === 0, col("event_id"))).over(w))
        .withColumn("last_click_us",
          max(when(col("kind") === 0, epochUs(col("ts")))).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"),
          col("last_click_id"),
          (epochUs(col("ts")) - col("last_click_us")).as("gap_us"))
        .orderBy("user_id", "ts_us", "event_id")
    }
  )

  private val joinBand = QueryDef(
    "q_join_band",
    "Banded range join (|ts_a − ts_b| ≤ 30 s) via epsilon-bucketing: " +
      "each side keys on floor(us/ε); the smaller side explodes to its " +
      "three candidate buckets, the join is a plain equi-join on the " +
      "bucket, and the exact band predicate filters candidates. Every " +
      "qualifying pair is found exactly once (bucket distance of a " +
      "qualifying pair is ≤ 1). Candidates per row are bounded by band " +
      "density — never the O(n·m) crossJoin+filter a naive theta join " +
      "costs.",
    Some("""WITH a AS (SELECT event_id AS a_id, epoch_us(CAST(ts AS TIMESTAMP)) AS a_us
           |           FROM events WHERE event_type = 'purchase'),
           |b AS (SELECT event_id AS b_id, epoch_us(CAST(ts AS TIMESTAMP)) AS b_us
           |      FROM events WHERE event_type = 'signup')
           |SELECT a_id, b_id, a_us - b_us AS gap_us
           |FROM a JOIN b ON abs(a_us - b_us) <= 30000000
           |ORDER BY a_id, b_id""".stripMargin),
    (s, d) => {
      val eps = 30000000L // 30 s in µs; all ts are epoch-positive
      val a = events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id").as("a_id"), epochUs(col("ts")).as("a_us"))
      val b = events(s, d).filter(col("event_type") === "signup")
        .select(col("event_id").as("b_id"), epochUs(col("ts")).as("b_us"))
        .withColumn("bucket", expr(s"b_us DIV $eps"))
      val aExp = a.withColumn("bucket",
        explode(array(expr(s"a_us DIV $eps - 1"), expr(s"a_us DIV $eps"),
          expr(s"a_us DIV $eps + 1"))))
      aExp.join(b, "bucket")
        .filter(abs(col("a_us") - col("b_us")) <= eps)
        .select(col("a_id"), col("b_id"), (col("a_us") - col("b_us")).as("gap_us"))
        .orderBy("a_id", "b_id")
    }
  )

  // ---------------------------------------------------------- aggregations

  private val aggCount = QueryDef(
    "q_agg_count",
    "Grouped counts (reference app/main.py:95-96,112-117 valid/invalid " +
      "counters) + distinct users per type.",
    Some("""SELECT event_type, count(*) AS n,
           |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"), lng(countDistinct(col("user_id"))).as("n_users"))
      .orderBy("event_type")
  )

  private val aggSalted = QueryDef(
    "q_agg_salted",
    "Two-stage salted aggregation (skew mitigation, graft.ops.Skew): " +
      "salt spreads each hot low-cardinality key over 16 reducers for " +
      "partial count/sum, stage 2 combines partials — identical result " +
      "to the direct GROUP BY the oracle runs, with every reduce task " +
      "bounded at volume/16 under arbitrary key skew.",
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => graft.ops.Skew.saltedSumCount(events(s, d), Seq("event_type"),
      col("value"), col("event_id"), 16)
      .orderBy("event_type")
  )

  private val aggHash = QueryDef(
    "q_agg_hash",
    "TPC-H Q1-shaped multi-aggregate hash aggregation with exact " +
      "decimal arithmetic (partial+final agg; map-side combine).",
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '1999-06-01'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (s, d) => lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1999-06-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"))).as("sum_disc_price"),
        dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"))).as("sum_charge"),
        round(sumMoney(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        round(sumMoney(col("l_extendedprice")) / count(lit(1)), 6).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  )

  private val aggDistinct = QueryDef(
    "q_agg_distinct",
    "Exact count-distinct per group (expand+two-phase agg under the hood).",
    Some("""SELECT l_returnflag,
           |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS nd_part,
           |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
           |  CAST(count(DISTINCT strftime(l_shipdate, '%Y-%m')) AS BIGINT) AS nd_month
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    (s, d) => lineitem(s, d).groupBy("l_returnflag")
      .agg(lng(countDistinct(col("l_partkey"))).as("nd_part"),
        lng(countDistinct(col("l_suppkey"))).as("nd_supp"),
        lng(countDistinct(date_format(col("l_shipdate"), "yyyy-MM"))).as("nd_month"))
      .orderBy("l_returnflag")
  )

  private val aggRollup = QueryDef(
    "q_agg_rollup",
    "Rollup over (returnflag, linestatus); subtotal rows surfaced via " +
      "coalesce to 'ALL' (keys never collide with real values).",
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf,
           |       coalesce(l_linestatus, 'ALL') AS ls,
           |       count(*) AS n,
           |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY rf, ls""".stripMargin),
    (s, d) => lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sumMoney(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"))
      .orderBy("rf", "ls")
  )

  private val aggCube = QueryDef(
    "q_agg_cube",
    "Cube over (orderstatus, orderpriority).",
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st,
           |       coalesce(o_orderpriority, 'ALL') AS pri,
           |       count(*) AS n,
           |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
           |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
           |ORDER BY st, pri""".stripMargin),
    (s, d) => orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
        col("n"), col("sum_price"))
      .orderBy("st", "pri")
  )

  private val aggCollect = QueryDef(
    "q_agg_collect",
    "Order-preserving list aggregation (reference app/main.py:81 " +
      "'\\n\\n'.join of ordered pages): per-user event-type sequence in " +
      "explicit (ts, event_id) order — sort_array over (key, value) " +
      "structs, never bare collect_list (which has no order contract).",
    Some("""SELECT user_id, count(*) AS n,
           |       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
           |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events) e
           |GROUP BY user_id ORDER BY user_id""".stripMargin),
    (s, d) => events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        array_join(
          expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
          ",").as("seq"))
      .orderBy("user_id")
  )

  // --------------------------------------------------- sort / limit / topk

  private val sortLimit = QueryDef(
    "q_sort_limit",
    "Global sort + limit → Spark TakeOrderedAndProject (per-partition " +
      "top-k then merge on the driver; never a full global sort).",
    Some("""SELECT l_orderkey, l_linenumber, l_extendedprice
           |FROM lineitem
           |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
           |LIMIT 100""".stripMargin),
    (s, d) => lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  )

  private val topkGroup = QueryDef(
    "q_topk_group",
    "Top-3 per group via ranked window (single shuffle by group key).",
    Some("""SELECT p_brand, CAST(rk AS BIGINT) AS rk, p_partkey, p_retailprice
           |FROM (SELECT p_brand, p_partkey, p_retailprice,
           |             row_number() OVER (PARTITION BY p_brand
           |                                ORDER BY p_retailprice DESC, p_partkey) AS rk
           |      FROM part) t
           |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin),
    (s, d) => part(s, d)
      .withColumn("rk", lng(row_number().over(
        Window.partitionBy("p_brand")
          .orderBy(col("p_retailprice").desc, col("p_partkey")))))
      .filter(col("rk") <= 3)
      .select("p_brand", "rk", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "rk")
  )

  // ------------------------------------------------------------------ sets

  private val union = QueryDef(
    "q_union",
    "Union-all + distinct-count: multiplicity 2 where both branch " +
      "predicates hold — exercises bag and set union in one result.",
    Some("""SELECT p_partkey, count(*) AS multiplicity FROM (
           |  SELECT p_partkey FROM part WHERE p_brand IN ('Brand#1', 'Brand#2')
           |  UNION ALL
           |  SELECT p_partkey FROM part WHERE p_size <= 5
           |) u GROUP BY p_partkey ORDER BY p_partkey""".stripMargin),
    (s, d) => {
      val p = part(s, d)
      p.filter(col("p_brand").isin("Brand#1", "Brand#2")).select("p_partkey")
        .unionAll(p.filter(col("p_size") <= 5).select("p_partkey"))
        .groupBy("p_partkey").agg(count(lit(1)).as("multiplicity"))
        .orderBy("p_partkey")
    }
  )

  private val intersect = QueryDef(
    "q_intersect",
    "Intersect (distinct semantics in both engines).",
    Some("""SELECT p_partkey FROM part WHERE p_brand IN ('Brand#1', 'Brand#2')
           |INTERSECT
           |SELECT p_partkey FROM part WHERE p_size <= 25
           |ORDER BY p_partkey""".stripMargin),
    (s, d) => {
      val p = part(s, d)
      p.filter(col("p_brand").isin("Brand#1", "Brand#2")).select("p_partkey")
        .intersect(p.filter(col("p_size") <= 25).select("p_partkey"))
        .orderBy("p_partkey")
    }
  )

  private val except = QueryDef(
    "q_except",
    "Except (distinct semantics in both engines).",
    Some("""SELECT p_partkey FROM part WHERE p_brand IN ('Brand#1', 'Brand#2')
           |EXCEPT
           |SELECT p_partkey FROM part WHERE p_size <= 25
           |ORDER BY p_partkey""".stripMargin),
    (s, d) => {
      val p = part(s, d)
      p.filter(col("p_brand").isin("Brand#1", "Brand#2")).select("p_partkey")
        .except(p.filter(col("p_size") <= 25).select("p_partkey"))
        .orderBy("p_partkey")
    }
  )

  // ------------------------------------------------------- TPC-H headliners

  private val tpchQ3 = QueryDef(
    "q_tpch_q3",
    "TPC-H Q3-shaped 3-way join + agg + top-10: customer(seg) ⋈ orders " +
      "⋈ lineitem; dims broadcast, one fact shuffle, TakeOrdered tail.",
    Some("""SELECT l.l_orderkey,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           |       o.o_orderpriority
           |FROM customer c
           |JOIN orders o ON c.c_custkey = o.o_custkey
           |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           |WHERE c.c_mktsegment = 'BUILDING'
           |  AND o.o_orderdate < TIMESTAMP '1998-06-01'
           |  AND l.l_shipdate  > TIMESTAMP '1998-06-01'
           |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
           |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
    (s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          dateStr(col("o_orderdate")).as("order_date"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }
  )

  private val tpchQ5 = QueryDef(
    "q_tpch_q5",
    "TPC-H Q5-shaped 5-way join: region→nation→customer→orders→lineitem " +
      "with all dimension sides broadcast; revenue per nation.",
    Some("""SELECT n.n_name,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           |       count(*) AS n_items
           |FROM region r
           |JOIN nation n ON n.n_regionkey = r.r_regionkey
           |JOIN customer c ON c.c_nationkey = n.n_nationkey
           |JOIN orders o ON o.o_custkey = c.c_custkey
           |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
           |  AND o.o_orderdate <  TIMESTAMP '1999-01-01'
           |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val dims = customer(s, d)
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey", "n_name")
      lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }
  )

  private val exceptAll = QueryDef(
    "q_except_all",
    "EXCEPT ALL (bag semantics): multiplicities subtract instead of " +
      "the distinct collapse q_except does — the dedup-aware set " +
      "difference (lineitem orderkeys minus one occurrence per " +
      "returned-flag row).",
    Some("""SELECT l_orderkey FROM lineitem WHERE l_quantity >= 30
           |EXCEPT ALL
           |SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
           |ORDER BY l_orderkey""".stripMargin),
    (s, d) => {
      val l = lineitem(s, d)
      l.filter(col("l_quantity") >= 30).select("l_orderkey")
        .exceptAll(l.filter(col("l_returnflag") === "R").select("l_orderkey"))
        .orderBy("l_orderkey")
    }
  )

  private val intersectAll = QueryDef(
    "q_intersect_all",
    "INTERSECT ALL (bag semantics): min(multiplicity) per value is " +
      "kept, vs the distinct collapse of q_intersect.",
    Some("""SELECT l_orderkey FROM lineitem WHERE l_quantity >= 30
           |INTERSECT ALL
           |SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.05
           |ORDER BY l_orderkey""".stripMargin),
    (s, d) => {
      val l = lineitem(s, d)
      l.filter(col("l_quantity") >= 30).select("l_orderkey")
        .intersectAll(l.filter(col("l_discount") >= 0.05).select("l_orderkey"))
        .orderBy("l_orderkey")
    }
  )

  private val sqlLateral = QueryDef(
    "q_sql_lateral",
    "Correlated LATERAL subquery (top-2 orders per customer by price): " +
      "Catalyst decorrelates the per-row subquery into a ranked window " +
      "join (DecorrelateInnerQuery) — no per-customer re-execution at " +
      "any scale, same answers as DuckDB's lateral.",
    // price stays the source DOUBLE untouched: a double→decimal cast here
    // rounds half-up in Spark but half-even in DuckDB, so the same value
    // can hash differently (seen in CORRECTNESS_r03 as the lone mismatch)
    Some("""SELECT c.c_custkey, o.ok, o.price
           |FROM customer c, LATERAL (
           |  SELECT o_orderkey AS ok, o_totalprice AS price
           |  FROM orders
           |  WHERE o_custkey = c.c_custkey
           |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
           |WHERE c.c_custkey < 500
           |ORDER BY c.c_custkey, o.ok""".stripMargin),
    (s, d) => {
      customer(s, d).createOrReplaceTempView("customer")
      orders(s, d).createOrReplaceTempView("orders")
      s.sql(
        """SELECT c.c_custkey, o.ok, o.price
          |FROM customer c, LATERAL (
          |  SELECT o_orderkey AS ok, o_totalprice AS price
          |  FROM orders
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
          |WHERE c.c_custkey < 500
          |ORDER BY c.c_custkey, o.ok""".stripMargin)
    }
  )

  /** Recursive CTE — the SQL-surface capability Spark gained in 4.x
    * (UnionLoop execution) and the idiomatic way a warehouse walks
    * hierarchies (org charts, BOMs, category trees) without driver
    * loops. The hierarchy here is the deterministic binary forest
    * parent(k) = k DIV 2 over partkeys, walked to the root per part;
    * readout = per-ancestor-depth part counts. Each recursion step is
    * ONE co-partitioned projection of the shrinking frontier (rows
    * leave the loop when their ancestor reaches 1), and the depth is
    * log2(max partkey) — ~45 iterations even at 100 TB key ranges,
    * never data-sized. Both engines run textually identical SQL up to
    * the integer-division spelling (DIV vs //); all outputs are exact
    * BIGINTs.
    */
  private val sqlRecursive = QueryDef(
    "q_sql_recursive",
    "Recursive CTE hierarchy walk (WITH RECURSIVE, Spark 4 UnionLoop): " +
      "every part ascends the deterministic binary forest parent(k) = " +
      "k DIV 2 to the root; per ancestor depth the part count and " +
      "min/max key - the org-chart/BOM traversal shape in pure SQL.",
    Some("""WITH RECURSIVE chain(k, anc, depth) AS (
           |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM part
           |  UNION ALL
           |  SELECT k, anc // 2, depth + 1 FROM chain WHERE anc > 1)
           |SELECT depth, CAST(count(*) AS BIGINT) AS n_parts,
           |       CAST(min(k) AS BIGINT) AS min_part,
           |       CAST(max(k) AS BIGINT) AS max_part
           |FROM chain GROUP BY depth ORDER BY depth""".stripMargin),
    (s, d) => {
      part(s, d).select("p_partkey").createOrReplaceTempView("graft_part_rec")
      s.sql(
        """WITH RECURSIVE chain(k, anc, depth) AS (
          |  SELECT p_partkey, p_partkey, CAST(0 AS BIGINT) FROM graft_part_rec
          |  UNION ALL
          |  SELECT k, anc DIV 2, depth + 1 FROM chain WHERE anc > 1)
          |SELECT depth, CAST(count(*) AS BIGINT) AS n_parts,
          |       CAST(min(k) AS BIGINT) AS min_part,
          |       CAST(max(k) AS BIGINT) AS max_part
          |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)
    }
  )

  private val tpchQ1 = QueryDef(
    "q_tpch_q1",
    "TPC-H Q1-shaped pricing summary: one full lineitem pass, exact " +
      "decimal sums for every money column, derived averages as " +
      "round(sum/count, 6). The canonical map-side-partial-aggregation " +
      "workload: 60k rows (or 60 billion) reduce to 6 groups before the " +
      "exchange.",
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           |       round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           |       CAST(count(*) AS BIGINT) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (s, d) => {
      val discPrice = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dbl(sum(expr("CAST(l_quantity AS DECIMAL(12,2))"))).as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_base_price"),
          dbl(sum(expr(discPrice))).as("sum_disc_price"),
          dbl(sum(expr(s"$discPrice * (CAST(1.00 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))"))).as("sum_charge"),
          round(dbl(sum(expr("CAST(l_quantity AS DECIMAL(12,2))"))) / count(lit(1)), 6).as("avg_qty"),
          round(dbl(sum(money(col("l_extendedprice")))) / count(lit(1)), 6).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }
  )

  private val tpchQ6 = QueryDef(
    "q_tpch_q6",
    "TPC-H Q6-shaped forecasting-revenue scan: three pushed-down " +
      "predicates (range + between + upper bound) into one parquet " +
      "scan, exact decimal revenue sum, zero-shuffle global aggregate.",
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           |       CAST(count(*) AS BIGINT) AS n_rows
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           |  AND l_shipdate <  TIMESTAMP '1999-01-01'
           |  AND l_discount BETWEEN 0.05 AND 0.07
           |  AND l_quantity < 24""".stripMargin),
    (s, d) => lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  )

  private val tpchQ10 = QueryDef(
    "q_tpch_q10",
    "TPC-H Q10-shaped returned-item report: top-20 customers by revenue " +
      "lost to returns in one quarter. Fact side filtered at the scan " +
      "(returnflag + order-date pushdown), nation broadcast, customer " +
      "joined on the aggregation key, top-20 via TakeOrderedAndProject " +
      "(never a full sort of the aggregate).",
    Some("""SELECT c.c_custkey, c.c_name, n.n_name,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
           |FROM customer c
           |JOIN orders o ON o.o_custkey = c.c_custkey
           |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           |JOIN nation n ON n.n_nationkey = c.c_nationkey
           |WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
           |  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
           |  AND l.l_returnflag = 'R'
           |GROUP BY c.c_custkey, c.c_name, n.n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
    (s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val l = lineitem(s, d).filter(col("l_returnflag") === "R")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }
  )

  private val tpchQ18 = QueryDef(
    "q_tpch_q18",
    "TPC-H Q18-shaped large-order report: orders whose total quantity " +
      "exceeds 150, with their customer. The HAVING subquery becomes a " +
      "self-aggregation + semi-join shape: lineitem aggregates once on " +
      "l_orderkey (map-side combine), the qualifying-key set joins back " +
      "— no correlated re-execution, one pass over the fact table.",
    Some("""WITH big AS (
           |  SELECT l_orderkey,
           |         CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
           |  FROM lineitem GROUP BY l_orderkey
           |  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150)
           |SELECT c.c_custkey, c.c_name, o.o_orderkey,
           |       epoch_us(o.o_orderdate) AS o_date_us, b.total_qty
           |FROM big b
           |JOIN orders o ON o.o_orderkey = b.l_orderkey
           |JOIN customer c ON c.c_custkey = o.o_custkey
           |ORDER BY b.total_qty DESC, o.o_orderkey""".stripMargin),
    (s, d) => {
      val big = lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(money(col("l_quantity"))).as("q"))
        .filter(col("q") > 150)
        .select(col("l_orderkey"), dbl(col("q")).as("total_qty"))
      big.join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          // NTZ → LTZ is identity under the session's pinned UTC zone
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_date_us"),
          col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
    }
  )

  private val tpchQ14 = QueryDef(
    "q_tpch_q14",
    "TPC-H Q14-shaped promo-revenue share: one shipdate month pushed " +
      "to the lineitem scan, partkey equi-join against part (a " +
      "dimension that shuffle-joins at 100 TB; AQE broadcasts it at " +
      "small SF), conditional exact-decimal sums, and a single IEEE " +
      "division + round(6) at the end (the q_corr float discipline).",
    Some("""SELECT
           |  CAST(coalesce(sum(CASE WHEN p.p_type LIKE 'PROMO%'
           |        THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END), 0) AS DOUBLE) AS promo_revenue,
           |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
           |  round(100.0 * CAST(coalesce(sum(CASE WHEN p.p_type LIKE 'PROMO%'
           |        THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END), 0) AS DOUBLE)
           |      / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6) AS promo_pct
           |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           |WHERE l.l_shipdate >= TIMESTAMP '1997-06-01'
           |  AND l.l_shipdate <  TIMESTAMP '1997-07-01'""".stripMargin),
    (s, d) => {
      val rev = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
      val l = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      val promo = dbl(coalesce(sum(when(col("p_type").like("PROMO%"), expr(rev))), lit(0)))
      val total = dbl(sum(expr(rev)))
      l.join(part(s, d), col("p_partkey") === col("l_partkey"))
        .agg(promo.as("promo_revenue"), total.as("total_revenue"),
          round(lit(100.0) * promo / total, 6).as("promo_pct"))
    }
  )

  private val tpchQ19 = QueryDef(
    "q_tpch_q19",
    "TPC-H Q19-shaped disjunctive join predicate (OR of brand×quantity " +
      "conjunctions). The cross-table OR cannot push down as-is, so " +
      "each side is pre-filtered with the union of its per-side implied " +
      "predicates — p_brand IN (…) reaches the part scan, l_quantity " +
      "BETWEEN 1 AND 30 reaches the lineitem scan (exactness-preserving: " +
      "every disjunct implies them) — then the exact OR applies after " +
      "the equi-join. The classic Q19 pushdown derivation.",
    Some("""SELECT p.p_brand,
           |       CAST(count(*) AS BIGINT) AS n_lines,
           |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
           |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
           |WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1  AND 11)
           |   OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20)
           |   OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30)
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val rev = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
      val p = part(s, d).filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
      val l = lineitem(s, d).filter(col("l_quantity").between(1, 30))
      l.join(p, col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30)))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"), dbl(sum(expr(rev))).as("revenue"))
        .orderBy("p_brand")
    }
  )

  private val tpchQ22 = QueryDef(
    "q_tpch_q22",
    "TPC-H Q22-shaped dormant-customer report: customers above the " +
      "global average balance with fewer than 8 orders, per nation. " +
      "The scalar subquery becomes a broadcast single-row cross join; " +
      "order counts pre-aggregate per custkey (map-side combine) " +
      "before the left join — never a correlated per-row subquery. " +
      "The threshold compares UNROUNDED doubles (exact decimal sum / " +
      "count is IEEE-identical in both engines, so no borderline flip).",
    Some("""WITH ab AS (
           |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
           |  FROM customer),
           |oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1)
           |SELECT c.c_nationkey,
           |       CAST(count(*) AS BIGINT) AS n_cust,
           |       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
           |FROM customer c CROSS JOIN ab
           |LEFT JOIN oc ON oc.o_custkey = c.c_custkey
           |WHERE c.c_acctbal > ab.avg_bal AND coalesce(oc.n_orders, 0) < 8
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val ab = customer(s, d)
        .agg((dbl(sum(money(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
      val oc = orders(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      customer(s, d).crossJoin(broadcast(ab))
        .join(oc, col("o_custkey") === col("c_custkey"), "left")
        .filter(col("c_acctbal") > col("avg_bal") &&
          coalesce(col("n_orders"), lit(0L)) < 8)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"),
          dbl(sum(money(col("c_acctbal")))).as("total_bal"))
        .orderBy("c_nationkey")
    }
  )

  private val tpchQ21 = QueryDef(
    "q_tpch_q21",
    "TPC-H Q21-shaped waiting-supplier report (adapted: the testdata " +
      "lineitem has no commit/receipt dates, so 'late' = shipped more " +
      "than 60 days after the order date). The nested EXISTS / NOT " +
      "EXISTS self-subqueries decorrelate to one LEFT SEMI and one LEFT " +
      "ANTI self-join of the fact on l_orderkey — never per-row " +
      "re-execution. The lineitem⋈orders shuffle on orderkey is built " +
      "once and its exchange is reused by the anti side; supplier is a " +
      "broadcast dimension.",
    Some("""SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
           |FROM supplier s
           |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
           |JOIN orders o ON o.o_orderkey = l1.l_orderkey
           |WHERE o.o_orderstatus = 'F'
           |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           |  AND EXISTS (SELECT 1 FROM lineitem l2
           |              WHERE l2.l_orderkey = l1.l_orderkey
           |                AND l2.l_suppkey <> l1.l_suppkey)
           |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
           |                  WHERE l3.l_orderkey = l1.l_orderkey
           |                    AND l3.l_suppkey <> l1.l_suppkey
           |                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
           |GROUP BY s.s_name
           |ORDER BY numwait DESC, s.s_name""".stripMargin),
    (s, d) => {
      val o = orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val late = lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val anyOther = lineitem(s, d)
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val lateOther = late
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      late
        .join(anyOther,
          col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
          "left_semi")
        .join(lateOther,
          col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"),
          "left_anti")
        .join(broadcast(supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }
  )

  private val tpchQ17 = QueryDef(
    "q_tpch_q17",
    "TPC-H Q17-shaped small-quantity-order revenue (adapted: brand-only " +
      "part filter — the testdata part has no p_container). The " +
      "correlated scalar avg subquery decorrelates to a per-partkey " +
      "pre-aggregation joined back to the fact: lineitem is restricted " +
      "by the broadcast part filter first, aggregated once per partkey, " +
      "and the same partkey exchange feeds both the aggregate and the " +
      "join-back — never a per-row subquery re-execution. The threshold " +
      "compares unrounded exact-decimal-sum/count doubles " +
      "(IEEE-identical in both engines).",
    Some("""WITH pa AS (
           |  SELECT l_partkey AS pa_partkey,
           |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
           |  FROM lineitem GROUP BY 1)
           |SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           |       CAST(count(*) AS BIGINT) AS n_lines
           |FROM lineitem l
           |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
           |JOIN pa ON pa.pa_partkey = l.l_partkey
           |WHERE l.l_quantity < 0.2 * pa.avg_qty""".stripMargin),
    (s, d) => {
      val p = part(s, d).filter(col("p_brand") === "Brand#23").select("p_partkey")
      // Restricting lineitem to the brand's partkeys BEFORE the per-part
      // avg is exactness-preserving (the avg is per partkey) and turns a
      // 100 TB full-fact aggregation into a broadcast-pruned one.
      val lp = lineitem(s, d).select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val pa = lp.groupBy("l_partkey")
        .agg((dbl(sum(money(col("l_quantity")))) / count(lit(1))).as("avg_qty"))
        .withColumnRenamed("l_partkey", "pa_partkey")
      lp.join(pa, col("l_partkey") === col("pa_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dbl(sum(money(col("l_extendedprice")))) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }
  )

  private val aggBoolBit = QueryDef(
    "q_agg_bool_bit",
    "Aggregate-function completion — boolean and bitwise reducers: " +
      "per order priority, bool_and/bool_or of a price predicate and " +
      "bit_and/bit_or/bit_xor of the order keys. All five are exact, " +
      "commutative, associative reducers (order-free by definition), " +
      "map-side combined in one fact aggregation to ≤5 rows — the " +
      "flag-rollup / bitmap-merge primitives warehouse marts use.",
    Some("""SELECT o_orderpriority,
           |       bool_and(o_totalprice > 1000) AS all_above_1k,
           |       bool_or(o_totalprice > 400000) AS any_above_400k,
           |       CAST(bit_and(o_orderkey) AS BIGINT) AS key_bit_and,
           |       CAST(bit_or(o_orderkey) AS BIGINT) AS key_bit_or,
           |       CAST(bit_xor(o_orderkey) AS BIGINT) AS key_bit_xor
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => orders(s, d)
      .groupBy("o_orderpriority")
      .agg(expr("bool_and(o_totalprice > 1000)").as("all_above_1k"),
        expr("bool_or(o_totalprice > 400000)").as("any_above_400k"),
        lng(expr("bit_and(o_orderkey)")).as("key_bit_and"),
        lng(expr("bit_or(o_orderkey)")).as("key_bit_or"),
        lng(expr("bit_xor(o_orderkey)")).as("key_bit_xor"))
      .orderBy("o_orderpriority")
  )

  // -------------------------------------------------------- schema evolution

  private val schemaEvolution = QueryDef(
    "q_schema_evolution",
    "Schema-evolution scan (mergeSchema): two generations of a hive-" +
      "partitioned parquet table written with DIFFERENT schemas — " +
      "generation p=1 carries (doc_id, lang), generation p=2 carries " +
      "(doc_id, n_chars, source) — read back through ONE merged-" +
      "schema scan that unions the columns and nulls the gaps, the " +
      "add-a-column-without-rewriting-history semantics every " +
      "long-lived 100 TB table needs. Output pins the merge contract " +
      "per generation: row counts, which columns are null in which " +
      "generation (lang null exactly in p=2, n_chars exactly in " +
      "p=1), and the exact sums that survive. Partition discovery " +
      "types p from the directory name. The oracle reads the SAME " +
      "files via union_by_name + hive_partitioning. Output dir keyed " +
      "by sf name (q_scan_jsonl precedent) so correctness and bench " +
      "runs never clobber each other.",
    Some("""SELECT CAST(p AS BIGINT) AS p, CAST(count(*) AS BIGINT) AS n,
           |       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lang_nulls,
           |       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nchars_nulls,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_nchars,
           |       CAST(sum(doc_id) AS BIGINT) AS sum_docid
           |FROM read_parquet('/root/repo/target/schema_evo/sf0.01/*/*.parquet',
           |                  union_by_name=true, hive_partitioning=1)
           |GROUP BY p ORDER BY p""".stripMargin),
    (s, d) => {
      // eager side effect at construction (q_scan_jsonl precedent):
      // materialize both schema generations for this query and the oracle
      val outDir = s"/root/repo/target/schema_evo/${new java.io.File(d).getName}"
      val docs = documents(s, d)
      docs.select(col("doc_id"), col("lang"))
        .write.mode("overwrite").parquet(s"$outDir/p=1")
      docs.select(col("doc_id"), col("n_chars"), col("source"))
        .write.mode("overwrite").parquet(s"$outDir/p=2")
      s.read.option("mergeSchema", "true").parquet(outDir)
        .groupBy(lng(col("p")).as("p"))
        .agg(lng(count(lit(1))).as("n"),
          lng(sum(when(col("lang").isNull, 1L).otherwise(0L))).as("lang_nulls"),
          lng(sum(when(col("n_chars").isNull, 1L).otherwise(0L))).as("nchars_nulls"),
          lng(sum(col("n_chars"))).as("sum_nchars"),
          lng(sum(col("doc_id"))).as("sum_docid"))
        .orderBy("p")
    }
  )

  val defs: Seq[QueryDef] = Seq(
    schemaEvolution,
    scanParquet, scanJsonl, scanCsv, scanOrc, project, filterPred, filterNull, enrich,
    joinLookup, joinBroadcast, joinSmj, joinOuter, joinSemi, joinAnti,
    joinTheta, joinAsof, joinBand,
    aggCount, aggSalted, aggHash, aggDistinct, aggRollup, aggCube, aggCollect,
    aggBoolBit,
    sortLimit, topkGroup, union, intersect, except, exceptAll, intersectAll,
    sqlLateral, sqlRecursive,
    tpchQ3, tpchQ5, tpchQ1, tpchQ6, tpchQ10, tpchQ18, tpchQ14, tpchQ19,
    tpchQ22, tpchQ21, tpchQ17)
}
