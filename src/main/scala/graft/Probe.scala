package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables._
import graft.ops.TextAnalysis._

/** Dev-only: stage-by-stage timing of the simhash pipeline. */
object Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val base = documents(s, d).select(col("doc_id"), split(col("text"), " ").as("ws"))
    val planted = base.unionAll(base.select((col("doc_id") + 100000).as("doc_id"),
      expr("concat(ws, array('zz', 'yy'))").as("ws")))

    time("words only")(planted.count())
    val sh = planted.withColumn("sh", expr(shinglesSpark(3))).select("doc_id", "sh")
    time("shingles")(sh.agg(sum(size(col("sh")))).collect())
    val simhashSpark =
      s"""aggregate(transform(sequence(0, 31),
         |  j -> CASE WHEN aggregate(sh, CAST(0 AS BIGINT),
         |                 (acc, h) -> acc + CASE WHEN ((h * (2 * j + 3) + j) % $P) % 2 = 1 THEN 1 ELSE -1 END) > 0
         |            THEN 1 ELSE 0 END),
         |  CAST(0 AS BIGINT), (a, b) -> a * 2 + b)""".stripMargin
    val sig = sh.withColumn("sig", expr(simhashSpark)).select("doc_id", "sig")
    time("signatures")(sig.agg(sum("sig")).collect())
    val keyed = sig.select(col("doc_id"), col("sig"),
      explode(expr("transform(sequence(0, 3), b -> b * 256 + ((sig >> (b * 8)) & 255))")).as("band_key"))
    time("keyed")(keyed.count())
    val cand = keyed.as("a")
      .join(keyed.as("b"), col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
    time("join no distinct")(cand.count())
    time("join + distinct")(cand.distinct().count())
    sig.persist()
    time("persisted sig")(sig.count())
    val keyed2 = sig.select(col("doc_id"), col("sig"),
      explode(expr("transform(sequence(0, 3), b -> b * 256 + ((sig >> (b * 8)) & 255))")).as("band_key"))
    val cand2 = keyed2.as("a")
      .join(keyed2.as("b"), col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("join w/ persisted sig")(cand2.distinct().count())
    s.stop()
  }
}
