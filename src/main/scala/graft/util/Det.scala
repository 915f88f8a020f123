package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers (SURVEY.md §7.5).
  *
  * The driver hash-compares Spark parquet output against DuckDB running
  * the oracle SQL, so every declared query must produce bit-identical
  * values in both engines. Rules encoded here:
  *
  *  - money / double aggregates: cast to an exact DECIMAL before
  *    summing (addition order then cannot change the result), cast the
  *    exact sum back to DOUBLE at the end. Both engines round the same
  *    decimal to the same double.
  *  - computed integers: always BIGINT (DuckDB's count/row_number/length
  *    are BIGINT; Spark's are int/long mix).
  *  - timestamps out: epoch microseconds as BIGINT (no parquet
  *    logical-type ambiguity); dates out: 'yyyy-MM-dd' strings.
  *  - float vectors: promote elements to DOUBLE *before* arithmetic so
  *    both engines do the identical exact float→double widening, and
  *    fold in array order (Spark `aggregate` and DuckDB `list_sum` are
  *    both sequential over the list).
  */
object Det {
  /** Exact monetary type: 2-decimal inputs (prices, balances, values). */
  val Money: DecimalType = DecimalType(18, 2)

  def money(c: Column): Column = c.cast(Money)
  def dbl(c: Column): Column = c.cast(DoubleType)
  def lng(c: Column): Column = c.cast(LongType)

  /** Exact order-independent sum of a 2-decimal double column. */
  def sumMoney(c: Column): Column = dbl(sum(money(c)))

  /** Exact mean of a 2-decimal double column: exact decimal sum, then a
    * single double division (identical in both engines).
    */
  def avgMoney(c: Column): Column = round(dbl(sum(money(c))) / count(lit(1)), 6)

  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def epochUs(c: Column): Column = unix_micros(c)

  /** Squared L2 distance between two float/double-array columns: a
    * sequential fold in array order with double widening — bit-identical
    * to the DuckDB twin `list_sum(list_transform(list_zip(a,b), ...))`.
    * Squared (not rooted) L2 matches FAISS IndexFlatL2, which returns
    * squared distances (reference rag_chatbot/main.py:27,36).
    * Native codegen'd expression; [[l2sqHof]] is the HOF form it
    * replaced, kept as the spec-checked semantic twin.
    */
  def l2sq(a: String, b: String): Column =
    graft.functions.VectorFunctions.vecL2Sq(col(a), col(b))

  def l2sqHof(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b,
       |  (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** Dot product of two float/double-array columns (double-widened
    * sequential fold; native, spec-twin [[dotHof]]).
    */
  def dot(a: String, b: String): Column =
    graft.functions.VectorFunctions.vecDot(col(a), col(b))

  def dotHof(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b,
       |  (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** Squared L2 norm of a float/double-array column (native, spec-twin
    * [[norm2Hof]]).
    */
  def norm2(a: String): Column =
    graft.functions.VectorFunctions.vecNorm2(col(a))

  def norm2Hof(a: String): Column = expr(
    s"""aggregate($a, CAST(0 AS DOUBLE),
       |  (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin)

  /** Cosine similarity of two float-array columns. */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** The sh.unpersist()/cand.unpersist() discipline as one combinator
    * (ADVICE r11): persist + materialize the small final frame, then
    * release the (possibly fact-sized) persisted intermediates so a
    * full-inventory driver run does not accumulate cached partitions
    * until LRU eviction skews bench timings.
    *
    * The RETURNED frame stays persisted by design (ADVICE r12: this is
    * an intentional, bounded leak): it is always a result-sized frame
    * (rows bounded by bins/groups/probes, never fact-sized), and it
    * must survive this call because the caller hands it to the driver,
    * which collects/writes it afterwards — unpersisting here would
    * recompute the whole lineage (including the just-released
    * intermediates) at consumption time. Long-lived drivers reclaim
    * these via the session boundary: Bench clears the cache between
    * passes (`spark.catalog.clearCache()`), and Verify's per-query
    * session write is the final consumption.
    */
  def materializeThenRelease(out: org.apache.spark.sql.DataFrame,
                             intermediates: org.apache.spark.sql.DataFrame*)
      : org.apache.spark.sql.DataFrame = {
    val o = out.persist()
    o.count()
    intermediates.foreach(_.unpersist())
    o
  }
}
