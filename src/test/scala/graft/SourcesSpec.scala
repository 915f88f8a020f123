package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Source/sink surface (SURVEY.md §2.1): binaryFile directory scan with
  * suffix filtering (the reference's PDF corpus scan, app/main.py:139),
  * schema'd JSONL read with corrupt-record tolerance (the salvage-
  * don't-crash stance, app/main.py:60-61), and JSONL/parquet sink
  * round-trips.
  */
class SourcesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("binaryFile scan: *.pdf glob filter, content + metadata columns") {
    val dir = tmpDir("graft_pdfs")
    Files.write(Paths.get(dir, "a.pdf"), "%PDF-1.4 fake-a".getBytes)
    Files.write(Paths.get(dir, "b.pdf"), "%PDF-1.4 fake-bb".getBytes)
    Files.write(Paths.get(dir, "notes.txt"), "not a pdf".getBytes)
    val df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf").load(dir)
    val rows = df.select(col("path"), col("length"), col("content")).collect()
    assert(rows.length === 2, "txt file must be filtered out")
    val byName = rows.map(r => r.getString(0).split('/').last ->
      ((r.getLong(1), new String(r.getAs[Array[Byte]](2))))).toMap
    assert(byName("a.pdf") === ((15L, "%PDF-1.4 fake-a")))
    assert(byName("b.pdf")._2.endsWith("fake-bb"))
  }

  test("JSONL source: declared schema + corrupt-record salvage lane") {
    val dir = tmpDir("graft_jsonl")
    val good = """{"question":"q1","answer":"a1","source_file":"d.pdf","window_index":1,"subchunk_index":2}"""
    val bad = """{"question": BROKEN"""
    Files.write(Paths.get(dir, "part.jsonl"), s"$good\n$bad\n".getBytes)
    val df = Tables.qaJsonl(spark, dir).cache()
    try {
      val ok = df.filter(col("_corrupt_record").isNull).collect()
      val corrupt = df.filter(col("_corrupt_record").isNotNull).collect()
      assert(ok.length === 1 && corrupt.length === 1)
      assert(ok.head.getAs[String]("question") === "q1")
      assert(ok.head.getAs[Int]("window_index") === 1)
      assert(corrupt.head.getAs[String]("_corrupt_record").contains("BROKEN"))
    } finally df.unpersist()
  }

  test("JSONL append sink round-trips the Q&A record shape") {
    import spark.implicits._
    val out = tmpDir("graft_sink_jsonl")
    val df = Seq(("q1", "a1", "d.pdf", 1, 2), ("q2", "a2", "d.pdf", 1, 3))
      .toDF("question", "answer", "source_file", "window_index", "subchunk_index")
    df.write.mode("append").json(out)
    df.write.mode("append").json(out) // append = incremental, like the reference's JSONL
    // cache: Spark refuses filtering raw JSON on only the internal
    // corrupt-record column (queryFromRawFilesIncludeCorruptRecordColumn)
    val back = Tables.qaJsonl(spark, out).cache()
    try {
      assert(back.count() === 4)
      assert(back.filter(col("_corrupt_record").isNotNull).count() === 0)
      assert(back.select("question").distinct().count() === 2)
    } finally back.unpersist()
  }

  test("parquet sink round-trip preserves schema and values") {
    import spark.implicits._
    val out = tmpDir("graft_sink_parquet") + "/t"
    val df = Seq((1L, Seq(1.0f, 2.0f), "x"), (2L, Seq(3.0f), "y"))
      .toDF("id", "vec", "s")
    df.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    // nullability flags legitimately widen through a parquet round-trip;
    // names and types must survive exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    assert(back.orderBy("id").collect().map(_.toSeq.toList).toList ===
      df.orderBy("id").collect().map(_.toSeq.toList).toList)
  }
}
