package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (SURVEY.md §5 test strategy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"

  /** Fresh EXPLICIT checkpoint dir for a streaming-spec query. A query
    * started without one gets a TEMP checkpoint that `stop()` deletes
    * — and that deletion races the async ExecutionListenerBus still
    * processing the final micro-batch, logging spurious
    * `PATH_NOT_FOUND .../state` ERRORs into green test runs. Explicit
    * (non-temp) checkpoints are never deleted on stop; /tmp is
    * reclaimed with the container.
    */
  def ckpt(): String =
    java.nio.file.Files.createTempDirectory("graft_ckpt").toString

  /** Set session confs for `body`, restoring previous values (or
    * unsetting) afterwards — the shared session must not leak one
    * suite's tuning into the next.
    */
  def withConf(pairs: (String, String)*)(body: => Unit): Unit =
    withConfValue(pairs)(body)

  /** Like [[withConf]] but returns the body's value. */
  def withConfValue[A](pairs: Seq[(String, String)])(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
