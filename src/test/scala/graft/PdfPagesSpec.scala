package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.Deflater

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfPages

/** The bytes→pages transform (reference app/main.py:19-27) on a real,
  * spec-built PDF: catalog → pages-tree walk (page order comes from
  * /Kids, NOT object numbering), FlateDecode and raw content streams,
  * literal/hex strings, escapes, TJ kerning arrays, and the
  * binaryFile → mapPartitions Spark path.
  */
class PdfPagesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deflate(s: String): Array[Byte] = {
    val d = new Deflater()
    d.setInput(s.getBytes("ISO-8859-1")); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Two pages; /Kids lists object 6 BEFORE object 3, so display order
    * must be (6, 3) even though 3 < 6. Page 6's stream is deflated.
    */
  private def buildPdf(): Array[Byte] = {
    val raw = "BT /F1 12 Tf 72 720 Td (Hello) Tj ( ) Tj (World) Tj " +
      "T* (line2 \\(escaped\\)) Tj ET"
    val flateSrc = "BT (Page2) Tj [(A)-120(B)] TJ <48 49> Tj ET"
    val flated = deflate(flateSrc)
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [6 0 R 3 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${raw.length} >> stream\n")
    w(raw); w("\nendstream endobj\n")
    w("6 0 obj << /Type /Page /Parent 2 0 R /Contents 7 0 R >> endobj\n")
    w(s"7 0 obj << /Length ${flated.length} /Filter /FlateDecode >> stream\n")
    out.write(flated); w("\nendstream endobj\n")
    w("trailer << /Root 1 0 R >>\n%%EOF\n")
    out.toByteArray
  }

  test("extract: page order from /Kids, Flate + raw streams, strings/escapes/TJ/hex") {
    val pages = PdfPages.extract("doc.pdf", buildPdf())
    assert(pages.map(_.page_index) == Seq(0, 1))
    // page 0 is OBJECT 6 (first in /Kids): deflated stream with a TJ
    // kerning array and a hex string
    assert(pages(0).text == "Page2ABHI")
    // page 1 is object 3: raw stream, T* line break, escaped parens
    assert(pages(1).text == "Hello World\nline2 (escaped)")
    assert(pages.forall(_.source_file == "doc.pdf"))
  }

  test("binaryFile → mapPartitions path: directory of PDFs to page rows") {
    val dir = Files.createTempDirectory("graft_pdf_pages").toString
    Files.write(Paths.get(dir, "a.pdf"), buildPdf())
    Files.write(Paths.get(dir, "decoy.txt"), "not a pdf".getBytes)
    val rows = PdfPages.pages(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).sortBy(_._2)
    assert(rows.length == 2)
    assert(rows(0) == (("a.pdf", 0, "Page2ABHI")))
    assert(rows(1) == (("a.pdf", 1, "Hello World\nline2 (escaped)")))
  }

  test("/Length-delimited streams survive PDF keywords inside page text") {
    // a page whose TEXT contains the parser's own structural keywords:
    // with a direct /Length (which synthesize writes), stream bytes are
    // sliced by count, so 'endstream'/'endobj' inside the data cannot
    // truncate the object scan
    val texts = Seq("see endstream endobj stream markers",
      "trailing carriage return\r", "4 0 obj fake header")
    val pages = PdfPages.extract("kw.pdf", PdfPages.synthesize(texts))
    assert(pages.map(_.text) == texts)
  }

  test("degrade, don't crash: unsupported filter and damaged file give empty/absent text") {
    // unsupported filter → page extracts as empty (pypdf's stance)
    val lzw = ("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 4 /Filter /LZWDecode >> stream\nXXXX\nendstream endobj\n")
      .getBytes("ISO-8859-1")
    val p = PdfPages.extract("x.pdf", lzw)
    assert(p.map(_.text) == Seq(""))
    // garbage bytes → no pages, no exception
    assert(PdfPages.extract("junk.pdf", "%PDF-1.4 garbage only".getBytes).isEmpty)
  }
}
