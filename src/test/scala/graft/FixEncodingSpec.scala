package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextAnalysisQueries.FixEncodingPhrases

/** Lossless-recovery gate for q_fix_encoding (the q_html_strip
  * precedent): the declared query only surfaces counts and a flag, so
  * this spec recomputes the full corrupt→repair round trip with plain
  * Java charsets and pins recovery VERBATIM, plus the properties that
  * make the generic double-decode safe to run corpus-wide.
  */
class FixEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def corrupt(s: String): String =
    new String(s.getBytes(UTF_8), ISO_8859_1)
  private def repair(s: String): String =
    new String(s.getBytes(ISO_8859_1), UTF_8)

  test("declared query: every planted corruption repairs losslessly") {
    val rows = SparkEntry.queries("q_fix_encoding")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("repaired_ok") == 1L,
        s"doc ${r.getLong(0)} did not recover")
      assert(r.getAs[Long]("n_chars_mojibake") >
        r.getAs[Long]("n_chars_intended"), "corruption must grow the text")
    }
  }

  test("plain-Java recomputation: corrupt is lossy-looking, repair inverts it") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      val intended = text + FixEncodingPhrases((id % 4).toInt)
      val moji = corrupt(intended)
      assert(moji != intended, s"doc $id: corruption was a no-op")
      assert(repair(moji) == intended, s"doc $id: repair not lossless")
      // marker accounting matches the closed-form oracle
      val marks = moji.count(_ == 'Ã')
      val expectMarks = Seq(3, 2, 1, 3)((id % 4).toInt)
      assert(marks == expectMarks, s"doc $id marker count")
    }
  }

  test("repair is the identity on clean ASCII (safe corpus-wide)") {
    val ascii = "plain ascii text, nothing to fix (0-127) ~ !"
    assert(repair(ascii) == ascii)
    assert(corrupt(ascii) == ascii) // ASCII is a fixed point of both
  }

  test("double corruption is NOT repaired by one pass (known ftfy limit)") {
    // documents corrupted twice need two passes — pin the behavior so
    // nobody mistakes single-pass repair for a universal fixer
    val intended = "café"
    val twice = corrupt(corrupt(intended))
    assert(repair(twice) == corrupt(intended))
    assert(repair(repair(twice)) == intended)
  }
}
