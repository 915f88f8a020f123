package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_ann_compact's contract (VERDICT r14 #5): the incremental
  * tombstone compaction — keep surviving edges, recompute only
  * tombstone-adjacent nodes' lists — must EQUAL a survivors-only
  * rebuild of the graph, purge every tombstoned id from the persisted
  * edge table, and leave the probe no worse than the masked arm.
  */
class AnnCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val parts = queries.AnnQueries.annCompactParts(spark, sf)

  test("compacted edge table contains no tombstoned id, either side") {
    val (_, cedges, _, tombs) = parts
    val t = tombs.withColumnRenamed("vec_id", "src")
    assert(cedges.join(t, Seq("src"), "left_semi").count() == 0L)
    val t2 = tombs.withColumnRenamed("vec_id", "dst")
    assert(cedges.join(t2, Seq("dst"), "left_semi").count() == 0L)
  }

  test("incremental compaction equals the survivors-only rebuild exactly") {
    import org.apache.spark.sql.functions._
    val (_, cedges, _, tombs) = parts
    val e = graft.core.Tables.embeddings(spark, sf)
    val corpus = e.filter(col("vec_id") >= 5)
      .select(col("vec_id"), col("embedding"), col("label"))
    val survivors = corpus.join(tombs, Seq("vec_id"), "left_anti")
    val rebuild = queries.AnnQueries.hnswEdges(survivors)
    val extra = cedges.except(rebuild)
    val missing = rebuild.except(cedges)
    val (ne, nm) = (extra.count(), missing.count())
    if (ne != 0 || nm != 0) {
      extra.limit(10).collect().foreach(r => info(s"extra: $r"))
      missing.limit(10).collect().foreach(r => info(s"missing: $r"))
    }
    assert(ne == 0L, s"$ne edges in compacted but not in rebuild")
    assert(nm == 0L, s"$nm edges in rebuild but not in compacted")
  }

  test("compaction never hurts: recall >= masked, visited <= masked (totals)") {
    import org.apache.spark.sql.functions._
    val out = parts._1
    val agg = out.agg(
      sum("m_hits"), sum("c_hits"), sum("m_visited"), sum("c_visited")).head()
    assert(agg.getLong(1) >= agg.getLong(0),
      s"compact hits ${agg.getLong(1)} < masked ${agg.getLong(0)}")
    assert(agg.getLong(3) <= agg.getLong(2),
      s"compact visited ${agg.getLong(3)} > masked ${agg.getLong(2)}")
  }
}
