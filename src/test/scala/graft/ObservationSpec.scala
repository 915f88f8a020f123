package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables

/** Pipeline counters without a second pass. The reference counts valid
  * and invalid records imperatively as it loops (app/main.py:95-96,
  * 112-114); in a lazy distributed plan the equivalent is
  * `df.observe(...)` — accumulator-backed metrics collected DURING the
  * one action that materializes the result, not by re-running the
  * pipeline for a count. At 100 TB, "run it twice to get the stats" is
  * not an option; this pins the single-pass contract.
  */
class ObservationSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("observe() yields validity counters from the same single action") {
    val obs = Observation("qa_counters")
    val df = Tables.documents(spark, TestSpark.sf)
      .withColumn("valid", length(col("text")) >= 100)
      .observe(obs,
        count(lit(1)).as("n_total"),
        count(when(col("valid"), 1)).as("n_valid"),
        count(when(!col("valid"), 1)).as("n_invalid"),
        sum(col("n_chars")).as("chars_seen"))
    // ONE action drives both the result and the counters
    val kept = df.filter(col("valid")).count()
    val m: Map[String, Any] = obs.get
    def l(k: String): Long = m(k).asInstanceOf[Long]
    assert(l("n_valid") == kept)
    assert(l("n_total") == l("n_valid") + l("n_invalid"))
    // and the counters saw EVERY input row, including ones the filter
    // dropped from the result
    val total = Tables.documents(spark, TestSpark.sf).count()
    assert(l("n_total") == total)
    assert(l("chars_seen") > 0L)
  }
}
