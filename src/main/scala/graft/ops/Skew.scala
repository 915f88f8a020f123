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

  /** Salt-replicated equi-join: the structural skew fix for joins.
    *
    * A hot join key concentrates its entire matching volume in one
    * shuffle-join task (AQE's skew split handles this reactively, but
    * only for sort-merge partitions it can see; salting is the
    * proactive form that also survives a skewed build side). The big
    * side gets a deterministic salt in [0, buckets); the small side is
    * replicated once per salt value; the join key becomes (key, salt),
    * so one hot key spreads over `buckets` tasks. Row-for-row identical
    * to the plain equi-join (each big-side row matches exactly the
    * replica carrying its salt). `saltSource` must be deterministic —
    * rand() re-salts differently on task retry and silently loses rows.
    *
    * The small side is hinted shuffle_hash: if it were broadcast the
    * salt would be pointless (broadcast joins don't shuffle the big
    * side); the use case is a small side past the broadcast threshold.
    */
  def saltedEquiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, saltSource: Column, buckets: Int): DataFrame = {
    require(buckets >= 1)
    val b = big.withColumn("_salt_b", pmod(saltSource, lit(buckets)))
    val s = small.withColumn("_salt_s",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(s.hint("shuffle_hash"),
        col(bigKey) === col(smallKey) && col("_salt_b") === col("_salt_s"))
      .drop("_salt_b", "_salt_s")
  }

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
