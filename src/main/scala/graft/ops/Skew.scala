package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Det._

/** Skew mitigation (builder contract: "Skewed keys → salting or AQE
  * skew-join").
  *
  * A low-cardinality grouping key (e.g. `event_type` with a handful of
  * values over billions of events) concentrates each key's entire
  * volume in one reduce task — partial aggregation hides this for
  * algebraic aggregates until a high-cardinality key distribution is
  * itself skewed (one hot key with 10^9 distinct-heavy rows). The
  * salted two-stage shape bounds every reduce task at
  * |key-volume| / buckets regardless of skew:
  *
  *   stage 1: groupBy(keys :+ salt) — salt spreads one hot key over
  *            `buckets` reducers, each computing a partial aggregate;
  *   stage 2: groupBy(keys) — combines `buckets` partials per key.
  *
  * For algebraic aggregates (count/sum/min/max) the two-stage result is
  * identical to the direct groupBy — `q_agg_salted` proves it against
  * the plain GROUP BY DuckDB oracle. The salt derives from a
  * deterministic high-cardinality column, not `rand()`, so retried
  * tasks re-salt identically (nondeterministic salts break
  * recomputation under task retry — silent wrong results at scale).
  */
object Skew {

  /** Two-stage salted count + exact decimal sum per key. `saltSource`
    * must be a high-cardinality deterministic column.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
      saltSource: Column, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("_salt", pmod(saltSource, lit(buckets)))
      .groupBy((keyCols :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(money(valueCol)).as("_s"))
    partial
      .groupBy(keyCols: _*)
      .agg(lng(sum(col("_n"))).as("n"), dbl(sum(col("_s"))).as("sum_value"))
  }
}
