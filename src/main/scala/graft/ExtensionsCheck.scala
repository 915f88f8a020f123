package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev check: proves the cluster registration path — a session built
  * with `spark.sql.extensions=graft.functions.GraftSparkExtensions`
  * (the only hook available when the platform owns session creation)
  * resolves `shingle_hashes` from SQL text with no explicit register()
  * call. Must run in its own JVM (extensions apply at first-session
  * creation): `sbt "runMain graft.ExtensionsCheck"`.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val out = Seq("a b c d").toDF("text")
      .select(expr("shingle_hashes(split(text, ' '), 3)").as("sh"))
      .collect().head.getSeq[Long](0)
    assert(out.length == 2, s"expected 2 shingles, got $out")
    println(s"[extensions-check] OK: shingle_hashes via SparkSessionExtensions -> $out")
    spark.stop()
  }
}
