package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` maintaining a k-minimum-values (KMV) distinct
  * sketch: the k smallest DISTINCT hash values seen, as an ascending
  * sorted buffer.
  *
  * Why this exists (the 100 TB distinct-count path, SURVEY §2.14):
  * q_sketch_merge builds its KMV sketches with a window
  * (`row_number over (partition by grp order by hv)`), which must
  * shuffle every distinct hash to sort it. This aggregator instead
  * participates in partial aggregation: each map task reduces its
  * partition to ≤k values per group BEFORE the exchange, duplicates
  * are dropped on insert (an O(log k) membership probe — no upstream
  * `distinct` pass needed), and partial sketches merge associatively
  * (union, re-take the k smallest — the defining KMV property). The
  * exchange carries O(partitions · k) longs per group, independent of
  * both corpus size and gram-type count.
  *
  * Result equality with the window form is what q_distinct_n_sketch's
  * oracle twin checks (the DuckDB side IS the window form).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Vector[Long], Vector[Long]] {
  require(k >= 1)

  override def zero: Vector[Long] = Vector.empty

  override def reduce(buf: Vector[Long], hv: Long): Vector[Long] = {
    val i = searchInsert(buf, hv)
    if (i < buf.length && buf(i) == hv) buf // duplicate: already in sketch
    else if (buf.length >= k && i >= k) buf // larger than the kth min
    else (buf.take(i) :+ hv) ++ buf.slice(i, math.min(buf.length, k - 1))
  }

  /** First index whose value is >= hv (binary search, buffer sorted). */
  private def searchInsert(buf: Vector[Long], hv: Long): Int = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < hv) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def merge(x: Vector[Long], y: Vector[Long]): Vector[Long] =
    y.foldLeft(x)(reduce)

  override def finish(r: Vector[Long]): Vector[Long] = r

  override def bufferEncoder: Encoder[Vector[Long]] =
    ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Vector[Long]] =
    ExpressionEncoder[Vector[Long]]()
}

object KmvSketch {
  /** Untyped column form: `kmv(128)(col("hv"))` → ascending
    * `array<bigint>` of the ≤128 smallest distinct hash values.
    */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvSketch(k), Encoders.scalaLong)
}
