package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Embed
import graft.util.Det._

/** The text→vector seam (reference rag_chatbot/main.py:20-23) must make
  * retrieval runnable end-to-end from raw text: embed the corpus with the
  * deterministic stub, then run the SAME broadcast-probe top-1 plan
  * q_topk_knn uses on the precomputed embeddings table, and get the
  * identical answers the precomputed path gives for identical vectors.
  */
class EmbedSpec extends AnyFunSuite {
  private implicit val spark: org.apache.spark.sql.SparkSession = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.sf)
    .select(col("doc_id"), col("text")).as[Embed.TextRow]

  test("stub embedder: fixed dim, unit norm, repartition-stable") {
    val out = Embed.embed(docs).cache()
    val bad = out.filter(r => r.embedding.length != 64).count()
    assert(bad == 0)
    val norms = out.map(r => math.sqrt(r.embedding.map(x => x.toDouble * x).sum)).collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-6 || n == 0.0))
    // pure function of the text: identical output however the input splits
    val a = out.collect().map(r => r.doc_id -> r.embedding.toSeq).toMap
    val b = Embed.embed(docs.repartition(7)).collect()
      .map(r => r.doc_id -> r.embedding.toSeq).toMap
    assert(a == b)
    out.unpersist()
  }

  /** Broadcast-probe exact top-1 L2 — the q_topk_knn plan shape. */
  private def retrieveTop1(corpus: org.apache.spark.sql.DataFrame,
                           probes: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("probe_id").orderBy("d2", "cand_id")
    corpus.join(broadcast(probes))
      .withColumn("d2", round(l2sq("p_emb", "c_emb"), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("probe_id", "cand_id", "d2")
  }

  test("text→vector→retrieve: a probe with a corpus doc's text retrieves that doc at d2≈0") {
    val corpus = Embed.embed(docs).toDF()
      .select(col("doc_id").as("cand_id"), col("embedding").as("c_emb"))
    // probes are raw TEXT (doc 3's and doc 7's), embedded by the same seam
    val probeTexts = docs.filter(d => d.doc_id == 3L || d.doc_id == 7L)
      .map(d => Embed.TextRow(d.doc_id + 1000L, d.text))
    val probes = Embed.embed(probeTexts).toDF()
      .select(col("doc_id").as("probe_id"), col("embedding").as("p_emb"))
    val hits = retrieveTop1(corpus, probes).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(hits(1003L)._1 == 3L && hits(1003L)._2 == 0.0)
    assert(hits(1007L)._1 == 7L && hits(1007L)._2 == 0.0)
  }

  test("parity: retrieval over the embedded corpus == retrieval over a precomputed table of the same vectors") {
    val embedded = Embed.embed(docs).toDF().cache()
    // "precomputed" twin: same vectors arriving as a stored table
    // (round-tripped through parquet, like the embeddings table would be)
    val dir = java.nio.file.Files.createTempDirectory("graft_embed_parity").toString
    embedded.write.mode("overwrite").parquet(dir)
    val precomputed = spark.read.parquet(dir)
    val probes = Embed.embed(
      docs.filter(d => d.doc_id < 5L).map(d => Embed.TextRow(d.doc_id, d.text))).toDF()
      .select(col("doc_id").as("probe_id"), col("embedding").as("p_emb"))
    def run(c: org.apache.spark.sql.DataFrame) = retrieveTop1(
      c.select(col("doc_id").as("cand_id"), col("embedding").as("c_emb")), probes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run(embedded) == run(precomputed))
    embedded.unpersist()
  }
}
