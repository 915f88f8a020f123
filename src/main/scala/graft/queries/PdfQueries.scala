package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.sources.PdfPages
import graft.util.Det._

/** PDF ingestion in the graded path (reference app/main.py:19-27: the
  * pipeline's first stage is pypdf page extraction over a PDF corpus).
  */
object PdfQueries {

  private val pdfScan = QueryDef(
    "q_pdf_scan",
    "PDF bytes → pages in the graded path: synthesize a 40-page PDF " +
      "from docs 0-39 (bounded fixture — the 40-row collect is a " +
      "constant, not O(corpus)), scan it with binaryFile, extract page " +
      "texts executor-side (graft.sources.PdfPages: catalog → /Kids " +
      "page order, Flate/raw streams, full string-escape handling), and " +
      "digest each page. The oracle digests the same rows of the source " +
      "documents table — extraction must round-trip every byte.",
    Some("""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_extracted,
           |       md5(text) AS digest
           |FROM documents WHERE doc_id < 40 ORDER BY doc_id""".stripMargin),
    (s, d) => {
      // bounded fixture build (40 rows, constant at any corpus size):
      // page i of the synthesized PDF carries the i-th doc's text
      val rows = documents(s, d).filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text")).orderBy("doc_id")
        .collect()
      // fixture goes under java.io.tmpdir, NOT the repo tree — a query
      // builder must never write into the project checkout
      val dir = new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_pdf_scan/${new java.io.File(d).getName}")
      dir.mkdirs()
      java.nio.file.Files.write(
        dir.toPath.resolve("docs.pdf"),
        PdfPages.synthesize(rows.map(_.getString(1)).toSeq))
      // page_index → the REAL doc_id (no contiguous-from-zero
      // assumption); the map is ≤ 40 entries, a literal
      val idOf = typedLit(rows.zipWithIndex.map { case (r, i) => i -> r.getLong(0) }.toMap)
      PdfPages.pages(s, dir.toString)
        .select(element_at(idOf, col("page_index")).as("doc_id"),
          lng(length(col("text"))).as("n_chars_extracted"),
          md5(col("text")).as("digest"))
        .orderBy("doc_id")
    }
  )

  val defs: Seq[QueryDef] = Seq(pdfScan)
}
