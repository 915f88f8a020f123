package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One inventory entry (SURVEY.md §2): a Spark DataFrame builder plus,
  * where SQL-expressible, the DuckDB oracle twin the driver runs on the
  * same parquet tables. `oracle = None` downgrades to the driver's
  * rows-only check (reserved for sinks/streams).
  */
final case class QueryDef(
    key: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)
