package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DocStore

/** Tag-3 string block stats (r15): the physics q_docstore_prune_string's
  * oracle cannot observe — a lang-clustered table must SKIP the blocks
  * an equality/IN string predicate excludes, a scattered table must
  * not lose rows to wrong pruning, and range predicates on strings
  * must never stat-prune (prefix stats are equality-shaped only).
  */
class DocStoreStringStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  test("packPrefix orders by byte prefix; padding stays conservative") {
    import java.lang.Long.compareUnsigned
    assert(compareUnsigned(DocStore.packPrefix("ab"), DocStore.packPrefix("abc")) < 0)
    assert(compareUnsigned(DocStore.packPrefix("de"), DocStore.packPrefix("en")) < 0)
    assert(DocStore.packPrefix("aaaaaaaaX") == DocStore.packPrefix("aaaaaaaaY"),
      "bytes past 8 must not affect the prefix")
  }

  test("lang-clustered table: equality and IN skip foreign-lang blocks; " +
    "row sets exact; string ranges never stat-prune") {
    val dir = tmp("gds_str")
    val langs = Seq("de", "en", "es", "fr", "zh")
    // 2048 rows, clustered: 512-row runs per lang -> tight tag-3 stats
    val s2 = spark
    import s2.implicits._
    val df = spark.range(2560)
      .select(col("id").as("k"),
        element_at(typedLit(langs), (col("id") / 512).cast("int") + 1).as("lang"))
      .repartition(1).sortWithinPartitions("k")
    df.write.format("docstore").mode("overwrite").save(dir)
    val t = spark.read.format("docstore").load(dir)

    DocStore.blocksRead.reset(); DocStore.blocksSkipped.reset()
    val de = t.filter(col("lang") === "de").select("k")
      .collect().map(_.getLong(0)).toSet
    assert(de == (0L until 512L).toSet)
    assert(DocStore.blocksSkipped.sum() >= 3,
      s"equality must skip foreign-lang blocks, skipped=${DocStore.blocksSkipped.sum()}")
    assert(DocStore.blocksRead.sum() <= 2,
      s"read=${DocStore.blocksRead.sum()}")

    DocStore.blocksRead.reset(); DocStore.blocksSkipped.reset()
    val pair = t.filter(col("lang").isin("en", "zh")).count()
    assert(pair == 1024L)
    assert(DocStore.blocksSkipped.sum() >= 2, "IN-list must skip too")

    // range predicate on a string: stats are equality-shaped, every
    // block must be READ (no collation assumption baked into pruning)
    DocStore.blocksRead.reset(); DocStore.blocksSkipped.reset()
    val rng = t.filter(col("lang") > "es").count()
    assert(rng == 1024L, "fr + zh rows")
    assert(DocStore.blocksSkipped.sum() == 0L,
      "string range predicates must not stat-prune")
  }

  test("old files without tag-3 stats still read (back-compat is the " +
    "absent-stats path); scattered layout loses nothing") {
    val dir = tmp("gds_str2")
    val s2 = spark
    import s2.implicits._
    // scattered: every block mixes all langs -> stats wide, no skips,
    // but row-level filtering must stay exact
    spark.range(1000)
      .select(col("id").as("k"),
        element_at(typedLit(Seq("de", "en", "es")), (col("id") % 3).cast("int") + 1).as("lang"))
      .repartition(1)
      .write.format("docstore").mode("overwrite").save(dir)
    val t = spark.read.format("docstore").load(dir)
    val got = t.filter(col("lang") === "en").select("k")
      .collect().map(_.getLong(0)).toSet
    assert(got == (0L until 1000L).filter(_ % 3 == 1).toSet)
  }
}
