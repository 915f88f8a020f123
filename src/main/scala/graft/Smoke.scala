package graft

import org.apache.spark.sql.SparkSession

/** Local dev smoke: schema/read sanity across all tables. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    for (n <- Seq("lineitem", "orders", "customer", "documents", "embeddings")) {
      val df = core.Tables.t(spark, d, n)
      println(s"$n: ${df.count()} rows; ${df.schema.simpleString.take(200)}")
    }
    try {
      val ev = core.Tables.events(spark, d)
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch {
      case e: Throwable =>
        println(s"EVENTS READ FAILED: ${e.getMessage}")
        println("retry with nanosAsLong...")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val ev2 = core.Tables.events(spark, d)
        ev2.printSchema()
        ev2.show(3, truncate = false)
    }
    spark.stop()
  }
}
