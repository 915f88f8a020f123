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

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Contract note: `queries(k)(spark, dir)` returns the final plan but
    * is NOT guaranteed to be a pure plan-construction call — some
    * builders run bounded driver-side jobs first (a ≤ constant-row
    * collect for a fixture or literal map, a min/max for a constant
    * bucket grid, a persist+count materialization before an orderBy so
    * sampling cannot resample a nondeterministic upstream — see
    * PLANS.md "orderBy-resampling rule"). Every such action is O(1) in
    * corpus size by construction; callers should still treat query
    * construction as potentially running Spark jobs, not as free.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Inventory.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Inventory.oracleSql
}
