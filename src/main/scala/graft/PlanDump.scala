package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump executed (AQE-final) plans for selected queries.
  * Usage: runMain graft.PlanDump <sfDir> <outFile> [key ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val keys = if (args.length > 2) args.drop(2).toSeq
               else Seq("q_tpch_q3", "q_dedup_minhash", "q_ann_topk_agg",
                 "q_ann_lsh", "q_join_asof", "q_agg_salted", "q_pipeline_qa")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      sb ++= s"==== $k ====\n"
      sb ++= df.queryExecution.executedPlan.toString
      sb ++= "\n\n"
    }
    Files.writeString(Paths.get(out), sb.toString)
    spark.stop()
  }
}
