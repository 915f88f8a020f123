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
  */
object Sequence {

  /** Adds `seqName` = 1-based global rank of `key` (must be unique and
    * castable to long). Extra scans: one min/max job + one per-bucket
    * count job, both over the pruned key column only.
    */
  def globalSequence(df: DataFrame, key: String, seqName: String,
                     buckets: Int = 64): DataFrame = {
    val k = col(key).cast("long")
    val statsRow = df.agg(min(k).as("mn"), max(k).as("mx")).head()
    if (statsRow.isNullAt(0)) {
      // empty input: no rows to number; keep the schema contract
      return df.withColumn(seqName, lit(null).cast("long"))
    }
    val mn = statsRow.getLong(0)
    val mx = statsRow.getLong(1)
    val width = math.max(1L, (mx - mn) / buckets + 1L)
    def bucketOf(c: Column): Column =
      ((c.cast("long") - lit(mn)) / lit(width)).cast("int")

    // bounded collect: ≤ `buckets` rows regardless of input size
    val counts = df.groupBy(bucketOf(col(key)).as("b")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = counts.map { case (b, n) =>
      val o = b -> acc; acc += n; o
    }.toMap

    val w = Window.partitionBy(col("__seq_bucket")).orderBy(col(key))
    df.withColumn("__seq_bucket", bucketOf(col(key)))
      .withColumn(seqName,
        element_at(typedLit(offsets), col("__seq_bucket")) +
          row_number().over(w).cast("long"))
      .drop("__seq_bucket")
  }
}
