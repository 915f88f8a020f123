package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.shingleHashes
import graft.functions.VectorFunctions
import graft.queries.DedupQueries

/** PPJoin candidate-bound proof for q_dedup_ngram (VERDICT r1 item 2):
  * the length + positional filters must (a) measurably shrink the
  * prefix-join fan-out and (b) lose no qualifying pair — the verified
  * J ≥ 3/5 result from the bounded candidate set must equal the result
  * from the bare AllPairs join. The sf0.01 DuckDB oracle re-proves (b)
  * end-to-end; this spec pins it at test scale with the reduction ratio.
  */
class DedupFilterSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val sh = DedupQueries.plantedWords(spark, sf)
    .withColumn("sh", shingleHashes(col("ws"), 3))
    .select("doc_id", "sh").persist()
  private lazy val prefix = DedupQueries.ngramPrefix(sh).persist()

  /** verification phase: J ≥ 3/5 over the candidate set */
  private def verified(cand: org.apache.spark.sql.DataFrame) = cand
    .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
      size(col("sh")).as("na")), "doc_a")
    .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
      size(col("sh")).as("nb")), "doc_b")
    .withColumn("n_int", VectorFunctions.sortedIntersectCount(col("sh_a"), col("sh_b")))
    .filter(lit(5) * col("n_int") >= lit(3) * (col("na") + col("nb") - col("n_int")))
    .select("doc_a", "doc_b")

  test("positional + length filters are lossless (same verified pairs)") {
    val bounded = verified(DedupQueries.ngramCandidates(prefix).distinct())
    val bare = verified(DedupQueries.ngramCandidates(prefix, bounded = false).distinct())
    assert(bounded.exceptAll(bare).isEmpty && bare.exceptAll(bounded).isEmpty)
    assert(bounded.count() > 0) // planted twins must be recovered
  }

  test("filters measurably shrink the prefix-join fan-out") {
    val raw = DedupQueries.ngramCandidates(prefix, bounded = false).count()
    val kept = DedupQueries.ngramCandidates(prefix).count()
    info(f"prefix-collision rows: bare=$raw%d bounded=$kept%d " +
      f"(${100.0 * kept / raw}%.1f%% kept)")
    assert(kept < raw,
      s"positional/length filters pruned nothing: $kept vs $raw")
  }
}
