package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Compact

/** Small-files compaction: many tiny part files → few target-sized
  * files, contents identical, input never touched.
  */
class CompactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def partFiles(dir: String): Seq[File] =
    new File(dir).listFiles().toSeq
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))

  test("compactParquet: 40 tiny files → ceil(bytes/target) files, same rows") {
    val base = Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    spark.range(0, 20000)
      .select(col("id"), concat(lit("payload_"), col("id")).as("v"))
      .repartition(40).write.parquet(in)
    assert(partFiles(in).size == 40)

    val bytes = Compact.dirBytes(spark, in)
    assert(bytes > 0)
    val target = bytes / 4 + 1 // aim for ~4 files
    val n = Compact.compactParquet(spark, in, out, target)
    assert(n == 4, s"expected 4 target files, planned $n")
    assert(partFiles(out).size == 4)

    // identical contents, input untouched
    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(b.count() == 20000 && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(partFiles(in).size == 40)
  }

  test("compactJson: declared-schema JSONL compaction, same rows") {
    val base = Files.createTempDirectory("graft_compact_json").toString
    val in = s"$base/in"
    val out = s"$base/out"
    spark.range(0, 5000)
      .select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartition(20).write.json(in)
    assert(partFiles(in).size == 20)
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    val bytes = Compact.dirBytes(spark, in)
    val n = Compact.compactJson(spark, in, out, schema, bytes / 2 + 1)
    assert(n == 2 && partFiles(out).size == 2)
    val a = spark.read.schema(schema).json(in)
    val b = spark.read.schema(schema).json(out)
    assert(b.count() == 5000 && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("targetFiles never returns 0 and ignores _metadata files") {
    val dir = Files.createTempDirectory("graft_compact_empty").toString
    Files.write(new File(dir, "_SUCCESS").toPath, Array.emptyByteArray)
    assert(Compact.dirBytes(spark, dir) == 0L)
    assert(Compact.targetFiles(spark, dir, 1024L * 1024) == 1)
  }
}
