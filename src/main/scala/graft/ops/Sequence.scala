package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global sequence numbers.
  *
  * `row_number() OVER (ORDER BY key)` with no PARTITION BY forces Spark to
  * move the entire input through a single task ("No Partition Defined for
  * Window operation" warning) — a serialization point that cannot survive a
  * 100× scale-up. This helper assigns the identical global rank with a
  * two-pass offset scheme instead:
  *
  *   1. one tiny job reads min/max of the (numeric, unique) key — column
  *      pruning means the scan touches a single column;
  *   2. rows are range-bucketed by a pure function of the key
  *      (`(key - min) / width`), so bucketing is deterministic across
  *      retries and needs no sampling pass (unlike `repartitionByRange`);
  *   3. per-bucket counts (≤ `buckets` rows, a bounded driver collect —
  *      the same mechanism `RDD.zipWithIndex` uses) become cumulative
  *      offsets, broadcast as a literal map;
  *   4. `seq = offset(bucket) + row_number() OVER (PARTITION BY bucket
  *      ORDER BY key)` — every window partition is one bucket, so the sort
  *      is distributed across `buckets` tasks.
  *
  * Buckets only balance as well as the key distribution; a dense
  * monotonically-assigned id (the common lineage case, reference
  * app/main.py:107-109) balances perfectly. Result is bit-identical to the
  * single-partition form for any unique key.
  *
  * Contract / caveats:
  *   - The key must be unique, castable to long, and its span `max - min`
  *     must fit in a Long (verified eagerly — wider spans fail fast with
  *     `ArithmeticException` rather than wrapping into non-monotone
  *     buckets).
  *   - The input must be deterministic across jobs: the offset pass and
  *     the final window pass re-evaluate it independently, so a source
  *     whose rows drift between jobs would leave a bucket without an
  *     offset. That case raises an error at runtime (rather than silently
  *     yielding null seq); the pruned key projection is cached across the
  *     two statistics jobs to keep them consistent and avoid a second
  *     source scan.
  *   - EAGER: calling this runs the two statistics jobs immediately at
  *     DataFrame-construction time (plan-only consumers pay them too).
  */
object Sequence {

  /** Adds `seqName` = 1-based global rank of `key` (must be unique and
    * castable to long; span must fit in a Long). Extra scans: one cached
    * pass over the pruned key column feeding both the min/max job and the
    * per-bucket count job.
    */
  def globalSequence(df: DataFrame, key: String, seqName: String,
                     buckets: Int = 64): DataFrame = {
    // temp name guaranteed not to collide with an input column
    val tmp = Iterator.from(0).map(i => s"__seq_bucket$i")
      .find(n => !df.columns.contains(n)).get

    val keys = df.select(col(key).cast("long").as("__seq_key")).cache()
    try {
      val statsRow = keys.agg(min("__seq_key").as("mn"), max("__seq_key").as("mx")).head()
      if (statsRow.isNullAt(0)) {
        // empty input: no rows to number; keep the schema contract
        return df.withColumn(seqName, lit(null).cast("long"))
      }
      val mn = statsRow.getLong(0)
      val mx = statsRow.getLong(1)
      // fail fast on span overflow (e.g. keys at both Long extremes):
      // a wrapped span would make bucketOf non-monotone and seq wrong
      val span = Math.subtractExact(mx, mn)
      val width = math.max(1L, span / buckets + 1L)
      // safe: every key lies in [mn, mx], so key - mn ∈ [0, span] — no wrap
      def bucketOf(c: Column): Column =
        ((c.cast("long") - lit(mn)) / lit(width)).cast("int")

      // bounded collect: ≤ `buckets` rows regardless of input size
      val counts = keys.groupBy(bucketOf(col("__seq_key")).as("b")).count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val offsets: Map[Int, Long] = counts.map { case (b, n) =>
        val o = b -> acc; acc += n; o
      }.toMap

      val w = Window.partitionBy(col(tmp)).orderBy(col(key))
      val off = element_at(typedLit(offsets), col(tmp))
      // a missing bucket means the input changed between the count job and
      // this one — surface it loudly instead of emitting a silent null seq
      val checkedOff = when(off.isNotNull, off).otherwise(
        raise_error(lit(s"Sequence.globalSequence: no offset for bucket of $key — " +
          "input is not deterministic across jobs")).cast("long"))
      df.withColumn(tmp, bucketOf(col(key)))
        .withColumn(seqName, checkedOff + row_number().over(w).cast("long"))
        .drop(tmp)
    } finally keys.unpersist(blocking = false)
  }
}
