package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Regression tests for the literal reference behaviors (SURVEY.md §5.2
  * item 4): salvage precedence (app/main.py:46-58), odd-center ±2 page
  * window (app/main.py:76-82), threshold refusal
  * (rag_chatbot/main.py:39-43), kNN tiebreak determinism.
  */
class ReferenceSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salvage cascade: precedence bare > fenced > backtick > null") {
    val rows = Seq(
      ("""{"question": "q0", "answer": "a0"}""", 1, "q0"),
      ("junk\n```json\n{\"question\": \"q1\", \"answer\": \"a1\"}\n```", 2, "q1"),
      ("see `{\"question\": \"q2\", \"answer\": \"a2\"}` ok", 3, "q2"),
      ("no json at all", 0, null)
    ).toDF("raw", "want_stage", "want_q")
    val fenced = "(?s)```json\\s*(\\{.*?\\})\\s*```"
    val got = rows
      .withColumn("q1", get_json_object(col("raw"), "$.question"))
      .withColumn("c2", nullif(regexp_extract(col("raw"), fenced, 1), lit("")))
      .withColumn("c3", nullif(regexp_extract(col("raw"), "(?s)`(\\{.*?\\})`", 1), lit("")))
      .withColumn("q2", get_json_object(col("c2"), "$.question"))
      .withColumn("q3", get_json_object(col("c3"), "$.question"))
      .withColumn("stage", when(col("q1").isNotNull, 1)
        .when(col("q2").isNotNull, 2).when(col("q3").isNotNull, 3).otherwise(0))
      .withColumn("question", coalesce(col("q1"), col("q2"), col("q3")))
      .select("want_stage", "stage", "want_q", "question")
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(0), s"stage mismatch: $r")
      assert(Option(r.getString(3)) == Option(r.getString(2)), s"question mismatch: $r")
    }
  }

  test("page window: odd centers, ±2 frame, \\n\\n join, order from page_no") {
    // doc with 6 pages: centers 1,3,5; frames [1,3],[1,5],[3,6]
    val pages = (1 to 6).map(i => (1L, i, s"p$i")).toDF("doc_id", "page_no", "page_text")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("page_no").rowsBetween(-2, 2)
    val got = pages
      .withColumn("wtext", array_join(collect_list(col("page_text")).over(w), "\n\n"))
      .filter(col("page_no") % 2 === 1)
      .orderBy("page_no")
      .select("page_no", "wtext").as[(Int, String)].collect()
    assert(got.toSeq == Seq(
      (1, "p1\n\np2\n\np3"),
      (3, "p1\n\np2\n\np3\n\np4\n\np5"),
      (5, "p3\n\np4\n\np5\n\np6")))
  }

  test("kNN: top-1 exact L2, deterministic tiebreak, threshold refusal") {
    val q = SparkEntry.queries("q_topk_knn")(spark, TestSpark.sf)
    val rows = q.collect()
    assert(rows.length == 10)
    val refusal = "I don't have information on that subject."
    rows.foreach { r =>
      val d2 = r.getAs[Double]("d2")
      val ans = r.getAs[String]("answer")
      if (d2 > 1.28) assert(ans == refusal)
      else assert(ans.startsWith("label="))
    }
    // both branches exercised at this SF
    assert(rows.exists(_.getAs[String]("answer") == refusal))
    assert(rows.exists(_.getAs[String]("answer").startsWith("label=")))
  }

  test("entry smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
