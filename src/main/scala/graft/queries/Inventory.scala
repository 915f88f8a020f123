package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated operator inventory — the single registry behind
  * SparkEntry.queries / SparkEntry.oracleSql (SURVEY.md §2).
  */
object Inventory {
  val all: Seq[QueryDef] =
    Relational.defs ++ VectorQueries.defs ++ WindowQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ AnnQueries.defs ++
      TextAnalysisQueries.defs ++ PipelineQueries.defs ++
      StreamingQueries.defs ++ AnalyticsQueries.defs ++ PdfQueries.defs ++
      SessionQueries.defs ++ RankingQueries.defs ++ WarehouseQueries.defs ++
      TpchExtraQueries.defs ++ SketchQueries.defs ++ DocStoreQueries.defs ++
      GraphQueries.defs ++ StatsQueries.defs ++ EventFlowQueries.defs ++
      CorpusQueries.defs ++ MiningQueries.defs ++ MlEvalQueries.defs ++
      OpsQueries.defs ++ RecsysQueries.defs ++ StatsScaleQueries.defs ++
      PatternQueries.defs ++ SemanticsQueries.defs ++ LinalgQueries.defs ++
      LayoutQueries.defs ++ ArchiveQueries.defs

  require(all.map(_.key).distinct.size == all.size,
    "duplicate query keys in inventory")

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.key -> q.build).toMap

  val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.key -> o)).toMap
}
