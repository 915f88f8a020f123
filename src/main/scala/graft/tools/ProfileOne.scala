package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.SparkEntry

/** Scratch profiler: times one query key, printing per-stage wall time
  * and lineage. Dev tool, not part of the driver contract. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(key)
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val rdds = si.rddInfos.map(_.name).distinct.mkString(",")
        if (dur > 0.10)
          println(f"[stage] id=${si.stageId} parents=${si.parentIds.mkString("/")} tasks=${si.numTasks} ${dur}%.2f s rdds=$rdds")
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[profile] total: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
