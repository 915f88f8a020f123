package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** Scalar-function + text-pipeline inventory (SURVEY.md §2.8): string,
  * JSON, map, date, math and array functions; the reference's 3-stage
  * JSON salvage cascade (app/main.py:46-58); character chunking
  * (app/main.py:84-88); exact dedup.
  *
  * Everything is `org.apache.spark.sql.functions` / expr built-ins —
  * whole-stage-codegen'd, no UDFs anywhere (SURVEY.md §4.2 stance).
  */
object TextQueries {

  private val strFns = QueryDef(
    "q_str_fns",
    "String functions (reference app/main.py:43,91-92,139): case, " +
      "substring, trim, concat, regexp_replace (global), split, endswith.",
    Some("""SELECT c_custkey,
           |       upper(c_name) AS name_upper,
           |       lower(c_mktsegment) AS seg_lower,
           |       substr(c_name, 10, 9) AS id_digits,
           |       CAST(substr(c_name, 10, 9) AS BIGINT) AS id_parsed,
           |       trim('  ' || c_mktsegment || '  ') AS trimmed,
           |       regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
           |       ends_with(c_name, '7') AS ends7,
           |       string_split(c_name, '#')[2] AS after_hash
           |FROM customer ORDER BY c_custkey""".stripMargin),
    (s, d) => customer(s, d).select(
      col("c_custkey"),
      upper(col("c_name")).as("name_upper"),
      lower(col("c_mktsegment")).as("seg_lower"),
      substring(col("c_name"), 10, 9).as("id_digits"),
      lng(substring(col("c_name"), 10, 9)).as("id_parsed"),
      trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("trimmed"),
      regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
      col("c_name").endsWith("7").as("ends7"),
      element_at(split(col("c_name"), "#"), 2).as("after_hash"))
      .orderBy("c_custkey")
  )

  private val regexExtract = QueryDef(
    "q_regex_extract",
    "The reference's 3-stage JSON salvage cascade (app/main.py:46-58): " +
      "(1) parse raw; (2) ```json fenced block; (3) single-backtick " +
      "block; else null — same precedence order. Raw LLM-ish responses " +
      "are synthesized deterministically from documents (doc_id mod 4 " +
      "picks the shape).",
    Some("""WITH raws AS (
           |  SELECT doc_id,
           |    CASE CAST(doc_id % 4 AS INT)
           |      WHEN 0 THEN '{"question": "' || substr(text, 1, 40) || '?", "answer": "ok"}'
           |      WHEN 1 THEN 'Sure!' || chr(10) || '```json' || chr(10) || '{"question": "' || substr(text, 1, 40) || '?", "answer": "ok"}' || chr(10) || '```' || chr(10) || 'Done.'
           |      WHEN 2 THEN 'Try `{"question": "' || substr(text, 1, 40) || '?", "answer": "ok"}` now'
           |      ELSE 'no json here: ' || substr(text, 1, 40)
           |    END AS raw
           |  FROM documents),
           |staged AS (
           |  SELECT doc_id, raw,
           |    CASE WHEN json_valid(raw) THEN json_extract_string(raw, '$.question') END AS q1,
           |    NULLIF(regexp_extract(raw, '(?s)```json\s*(\{.*?\})\s*```', 1), '') AS c2,
           |    NULLIF(regexp_extract(raw, '(?s)`(\{.*?\})`', 1), '') AS c3
           |  FROM raws),
           |parsed AS (
           |  SELECT doc_id, q1,
           |    CASE WHEN c2 IS NOT NULL AND json_valid(c2) THEN json_extract_string(c2, '$.question') END AS q2,
           |    CASE WHEN c3 IS NOT NULL AND json_valid(c3) THEN json_extract_string(c3, '$.question') END AS q3
           |  FROM staged)
           |SELECT doc_id,
           |       CAST(CASE WHEN q1 IS NOT NULL THEN 1 WHEN q2 IS NOT NULL THEN 2
           |                 WHEN q3 IS NOT NULL THEN 3 ELSE 0 END AS BIGINT) AS stage,
           |       coalesce(q1, q2, q3) AS question
           |FROM parsed ORDER BY doc_id""".stripMargin),
    (s, d) => {
      val fenced = "(?s)```json\\s*(\\{.*?\\})\\s*```"
      val tick = "(?s)`(\\{.*?\\})`"
      documents(s, d)
        .withColumn("raw",
          when(col("doc_id") % 4 === 0,
            concat(lit("{\"question\": \""), substring(col("text"), 1, 40), lit("?\", \"answer\": \"ok\"}")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("Sure!\n```json\n{\"question\": \""), substring(col("text"), 1, 40), lit("?\", \"answer\": \"ok\"}\n```\nDone.")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("Try `{\"question\": \""), substring(col("text"), 1, 40), lit("?\", \"answer\": \"ok\"}` now")))
          .otherwise(concat(lit("no json here: "), substring(col("text"), 1, 40))))
        .withColumn("q1", get_json_object(col("raw"), "$.question"))
        .withColumn("c2", nullif(regexp_extract(col("raw"), fenced, 1), lit("")))
        .withColumn("c3", nullif(regexp_extract(col("raw"), tick, 1), lit("")))
        .withColumn("q2", get_json_object(col("c2"), "$.question"))
        .withColumn("q3", get_json_object(col("c3"), "$.question"))
        .select(col("doc_id"),
          lng(when(col("q1").isNotNull, 1).when(col("q2").isNotNull, 2)
            .when(col("q3").isNotNull, 3).otherwise(0)).as("stage"),
          coalesce(col("q1"), col("q2"), col("q3")).as("question"))
        .orderBy("doc_id")
    }
  )

  private val jsonFns = QueryDef(
    "q_json_fns",
    "JSON parse/extract/serialize (reference app/main.py:29-35,48,110): " +
      "field extraction, nested path extraction, key enumeration.",
    Some("""WITH p AS (
           |  SELECT event_type,
           |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           |         CAST(json_extract_string('{"outer": ' || props || '}', '$.outer.k') AS BIGINT) AS outer_k,
           |         array_to_string(json_keys(props), ',') AS keys
           |  FROM events)
           |SELECT event_type, count(*) AS n,
           |       CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k, min(k) AS min_k,
           |       CAST(sum(outer_k) AS BIGINT) AS sum_outer, min(keys) AS keys_sample
           |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("outer_k", get_json_object(
        concat(lit("{\"outer\": "), col("props"), lit("}")), "$.outer.k").cast("long"))
      .withColumn("keys", array_join(expr("json_object_keys(props)"), ","))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), lng(sum(col("k"))).as("sum_k"),
        max(col("k")).as("max_k"), min(col("k")).as("min_k"),
        lng(sum(col("outer_k"))).as("sum_outer"), min(col("keys")).as("keys_sample"))
      .orderBy("event_type")
  )

  private val mapFns = QueryDef(
    "q_map_fns",
    "Map functions: from_json → MapType, element_at, map_keys/size.",
    Some("""WITH m AS (
           |  SELECT event_id, event_type,
           |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           |         CAST(len(json_keys(props)) AS BIGINT) AS n_keys
           |  FROM events)
           |SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k,
           |       CAST(sum(n_keys) AS BIGINT) AS total_keys
           |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin),
    (s, d) => events(s, d)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("MAP<STRING, BIGINT>")))
      .withColumn("k", element_at(col("m"), "k"))
      .withColumn("n_keys", lng(size(map_keys(col("m")))))
      .groupBy("event_type")
      .agg(lng(sum(col("k"))).as("sum_k"), lng(sum(col("n_keys"))).as("total_keys"))
      .orderBy("event_type")
  )

  private val textStats = QueryDef(
    "q_text_stats",
    "Text statistics (north-star text analysis; reference app/main.py:87 " +
      "length_function=len): word counts, mean word length, stopword hits.",
    Some("""SELECT doc_id,
           |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           |       CAST(length(text) AS BIGINT) AS n_chars_q,
           |       round(CAST(length(replace(text, ' ', '')) AS DOUBLE) /
           |             len(string_split(text, ' ')), 6) AS avg_word_len,
           |       CAST(len(list_filter(string_split(text, ' '),
           |                            w -> w IN ('the', 'a'))) AS BIGINT) AS n_stop
           |FROM documents ORDER BY doc_id""".stripMargin),
    (s, d) => documents(s, d).select(
      col("doc_id"),
      lng(size(split(col("text"), " "))).as("n_words"),
      lng(length(col("text"))).as("n_chars_q"),
      round(dbl(length(regexp_replace(col("text"), " ", ""))) /
        size(split(col("text"), " ")), 6).as("avg_word_len"),
      lng(size(expr("filter(split(text, ' '), w -> w IN ('the', 'a'))"))).as("n_stop"))
      .orderBy("doc_id")
  )

  private val dateFns = QueryDef(
    "q_date_fns",
    "Date/time extraction, truncation and arithmetic on order dates.",
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
           |       CAST(month(o_orderdate) AS BIGINT) AS m,
           |       CAST(quarter(o_orderdate) AS BIGINT) AS q,
           |       count(*) AS n,
           |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           |       CAST(max(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS max_days,
           |       min(strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d')) AS min_due
           |FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin),
    (s, d) => orders(s, d)
      .groupBy(
        lng(year(col("o_orderdate"))).as("y"),
        lng(month(col("o_orderdate"))).as("m"),
        lng(quarter(col("o_orderdate"))).as("q"))
      .agg(count(lit(1)).as("n"),
        sumMoney(col("o_totalprice")).as("sum_price"),
        lng(max(datediff(col("o_orderdate"), lit("1995-01-01")))).as("max_days"),
        min(date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd")).as("min_due"))
      .orderBy("y", "m")
  )

  private val mathFns = QueryDef(
    "q_math_fns",
    "Arithmetic / rounding: exact decimal revenue, IEEE sqrt, " +
      "floor/ceil/abs/mod — no transcendentals (libm vs JDK would drift).",
    Some("""SELECT l_returnflag,
           |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           |       round(sqrt(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)), 6) AS sqrt_rev,
           |       CAST(floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS BIGINT) AS floor_avg_qty,
           |       CAST(ceil(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS BIGINT) AS ceil_avg_qty,
           |       CAST(sum(CAST(l_orderkey % 7 AS BIGINT)) AS BIGINT) AS sum_mod,
           |       CAST(round(abs(min(CAST(l_discount AS DECIMAL(4,2)) - CAST(0.05 AS DECIMAL(3,2)))), 2) AS DOUBLE) AS abs_min_disc
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    (s, d) => {
      val rev = dbl(sum(expr("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))")))
      lineitem(s, d).groupBy("l_returnflag")
        .agg(rev.as("revenue"),
          round(sqrt(rev), 6).as("sqrt_rev"),
          lng(floor(sumMoney(col("l_quantity")) / count(lit(1)))).as("floor_avg_qty"),
          lng(ceil(sumMoney(col("l_quantity")) / count(lit(1)))).as("ceil_avg_qty"),
          lng(sum(col("l_orderkey") % 7)).as("sum_mod"),
          round(abs(min(expr("CAST(l_discount AS DECIMAL(4,2)) - CAST(0.05 AS DECIMAL(3,2))"))), 2).cast("double").as("abs_min_disc"))
        .orderBy("l_returnflag")
    }
  )

  /** Fixed-stride chunking contract for the oracle-checked query: the
    * reference's recursive splitter is configured size=1500/overlap=200
    * (app/main.py:85-86); testdata docs are ≤ ~600 chars, so the graded
    * variant scales the contract down (size=100, overlap=20 → stride 80)
    * to produce real multi-chunk outputs. The 1500/200 recursive variant
    * lives in graft.ops.Chunker (scalatest-covered).
    */
  private val ChunkSize = 100
  private val ChunkStride = 80

  private val textChunk = QueryDef(
    "q_text_chunk",
    "Deterministic fixed-stride character chunking with overlap " +
      "(reference app/main.py:84-88,101) via sequence+transform+explode " +
      "— a generator, not a driver-side loop.",
    Some(s"""WITH n AS (
            |  SELECT doc_id, text,
            |         CAST(ceil((length(text) - ${ChunkSize - ChunkStride}) / $ChunkStride.0) AS INT) AS n_chunks
            |  FROM documents),
            |c AS (
            |  SELECT doc_id,
            |         unnest(generate_series(1, n_chunks)) AS chunk_no,
            |         unnest(list_transform(generate_series(1, n_chunks),
            |                i -> substr(text, (i - 1) * $ChunkStride + 1, $ChunkSize))) AS chunk
            |  FROM n)
            |SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no, chunk,
            |       CAST(length(chunk) AS BIGINT) AS chunk_len
            |FROM c ORDER BY doc_id, chunk_no""".stripMargin),
    (s, d) => documents(s, d)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, CAST(ceil((length(text) - ${ChunkSize - ChunkStride}) / $ChunkStride.0) AS INT)), i -> substring(text, (i - 1) * $ChunkStride + 1, $ChunkSize))"))
          .as(Seq("c0", "chunk")))
      .select(col("doc_id"), lng(col("c0") + 1).as("chunk_no"), col("chunk"),
        lng(length(col("chunk"))).as("chunk_len"))
      .orderBy("doc_id", "chunk_no")
  )

  private val dedupExact = QueryDef(
    "q_dedup_exact",
    "Exact dedup, scalable form (north-star dedup): group by md5(text) " +
      "— shuffles 16-byte digests, not document bodies — keep min(doc_id)" +
      " per group. Input is documents ∪ a shifted copy so every group " +
      "provably has a duplicate to drop.",
    Some("""WITH u AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id, text FROM documents)
           |SELECT min(doc_id) AS kept_doc_id, count(*) AS n_dups,
           |       CAST(min(length(text)) AS BIGINT) AS text_len
           |FROM u GROUP BY md5(text) ORDER BY kept_doc_id""".stripMargin),
    (s, d) => {
      val base = documents(s, d).select(col("doc_id"), col("text"))
      base.unionAll(base.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        .groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_dups"),
          lng(min(length(col("text")))).as("text_len"))
        .select("kept_doc_id", "n_dups", "text_len")
        .orderBy("kept_doc_id")
    }
  )

  val defs: Seq[QueryDef] = Seq(strFns, regexExtract, jsonFns, mapFns,
    textStats, dateFns, mathFns, textChunk, dedupExact)
}
