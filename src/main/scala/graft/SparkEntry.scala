package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual inventory lives in graft.queries.Inventory; one QueryDef
  * per implemented operator from SURVEY.md §2, each carrying its DuckDB
  * oracle twin.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_topk_knn = the reference's entire retrieval semantics
    * (rag_chatbot/main.py:31-47) as one DataFrame plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_topk_knn")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Inventory.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Inventory.oracleSql
}
