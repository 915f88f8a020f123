package graft

import org.apache.spark.sql.SparkSession

/** Local dev tool: time specific inventory queries (all if no args).
  * Usage: runMain graft.Smoke <sfDir> [key ...]
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val keys = if (args.length > 1) args.drop(1).toSeq
               else SparkEntry.queries.keys.toSeq.sorted
    for (k <- keys) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(k)(spark, d).count()
      println(f"[smoke] $k%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $n%9d rows")
    }
    spark.stop()
  }
}
