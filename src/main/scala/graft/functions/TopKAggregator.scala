package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate flowing into the top-k aggregation. */
case class ScoredCand(cand_id: Long, label: String, score: Double)

/** Typed `Aggregator` keeping the top-k candidates by
  * (score DESC, cand_id ASC) — the deterministic tiebreak every ranked
  * query in the inventory uses.
  *
  * Why this exists (SURVEY.md §2.4/§4.2 custom-Aggregator path): the
  * window-function top-k (`row_number over (partition by probe order by
  * score) <= k`) must shuffle EVERY scored row to sort it — at 100 TB
  * the N·M kNN score matrix goes through the exchange. An Aggregator
  * participates in partial aggregation: each map task reduces its
  * partition to k rows per probe before the shuffle, so the exchange
  * carries O(partitions · k) rows per probe instead of O(M). The buffer
  * is a bounded sorted list (reduce is O(k) per row, merge O(k)).
  *
  * Result equality with the window form is oracle-checked
  * (`q_ann_topk_agg` shares `q_ann_cosine`'s DuckDB twin) and
  * spec-checked.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredCand, Seq[ScoredCand], Seq[ScoredCand]] {
  require(k >= 1)

  private def lt(a: ScoredCand, b: ScoredCand): Boolean =
    a.score > b.score || (a.score == b.score && a.cand_id < b.cand_id)

  override def zero: Seq[ScoredCand] = Vector.empty

  override def reduce(buf: Seq[ScoredCand], a: ScoredCand): Seq[ScoredCand] =
    if (buf.size >= k && lt(buf.last, a)) buf
    else {
      val (before, after) = buf.span(lt(_, a))
      (before :+ a) ++ after.take(k - before.size - 1)
    }

  override def merge(x: Seq[ScoredCand], y: Seq[ScoredCand]): Seq[ScoredCand] =
    y.foldLeft(x)(reduce)

  override def finish(r: Seq[ScoredCand]): Seq[ScoredCand] = r

  override def bufferEncoder: Encoder[Seq[ScoredCand]] =
    ExpressionEncoder[Seq[ScoredCand]]()
  override def outputEncoder: Encoder[Seq[ScoredCand]] =
    ExpressionEncoder[Seq[ScoredCand]]()
}

object TopKByScore {
  /** Untyped column form: `topK(10)(col("cand_id"), col("label"),
    * col("score"))` → `array<struct<cand_id,label,score>>` sorted by
    * (score DESC, cand_id ASC).
    */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKByScore(k),
      Encoders.product[ScoredCand])
}
