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

  test("q_dedup_eval: verified = candidates ∩ truth, recall prices the bands") {
    val row = SparkEntry.queries("q_dedup_eval")(TestSpark.spark, TestSpark.sf)
      .collect().head
    val (nTruth, nCand, nVer) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // verification applies the SAME exact threshold as the truth arm,
    // so the verified set is exactly candidates ∩ truth
    assert(nVer <= nTruth && nVer <= nCand)
    assert(nTruth > 0 && nCand > 0)
    // banding must find most planted pairs but is allowed to miss some
    // (that miss IS the measurement); perfection would suggest the
    // truth arm degenerated into the candidate arm
    assert(row.getDouble(3) > 0.5, s"recall ${row.getDouble(3)}")
    assert(row.getDouble(4) > 0.5, s"precision ${row.getDouble(4)}")
    // cross-check n_truth against an independent brute-force count
    import org.apache.spark.sql.functions.col
    val sh = DedupQueries.plantedWords(TestSpark.spark, TestSpark.sf)
      .withColumn("sh", shingleHashes(col("ws"), 3))
      .select("doc_id", "sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = sh.keys.toSeq.sorted
    var brute = 0L
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val a = sh(ids(i)); val b = sh(ids(j))
      val inter = (a & b).size.toLong
      if (5 * inter >= 3 * (a.size + b.size - inter)) brute += 1
    }
    assert(nTruth == brute, s"truth $nTruth vs brute $brute")
  }
}
