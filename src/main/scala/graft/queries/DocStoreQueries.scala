package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.util.Det._

/** DataSource V2 `docstore` scan (SURVEY.md §2.1) — the custom
  * columnar source with pushdown, exercised end-to-end under the
  * oracle gate.
  */
object DocStoreQueries {

  private val scanDocstore = QueryDef(
    "q_scan_docstore",
    "Custom DataSource V2 columnar scan: write the documents table " +
      "into the `docstore` format (one .gds file per task, 512-row " +
      "blocks with per-column min/max stats), read it back with a " +
      "selective predicate and a narrow projection. The n_chars " +
      "filter is absorbed by the reader (block stats skip + row eval, " +
      "no residual Filter node) and the text column is never decoded " +
      "— the 100 TB story is reading less, driven through Spark's " +
      "connector API so Catalyst plans it. The oracle runs the same " +
      "predicate against the SOURCE parquet table, so a lossy or " +
      "mangling docstore write/read fails the hash compare against " +
      "ground truth. Dir keyed by sf name like q_scan_jsonl.",
    Some("""SELECT doc_id, lang, source, n_chars
           |FROM documents
           |WHERE n_chars >= 300
           |ORDER BY doc_id""".stripMargin),
    (s, d) => {
      // eager side effect at construction: materialize the docstore dir
      // (sorted by the filter column so block stats have tight ranges)
      val outDir = s"/root/repo/target/docstore_scan/${new java.io.File(d).getName}"
      documents(s, d)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .repartition(4, col("doc_id"))
        .sortWithinPartitions("n_chars")
        .write.format("docstore").mode("overwrite").save(outDir)
      s.read.format("docstore").load(outDir)
        .filter(col("n_chars") >= 300L)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }
  )

  val defs: Seq[QueryDef] = Seq(scanDocstore)
}
