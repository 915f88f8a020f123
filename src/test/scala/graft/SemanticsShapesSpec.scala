package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation for the edge-semantics batch
  * (q_join_nullsafe / q_explode_outer / q_roll_corr): the NULL-key
  * match and NULL-row preservation are asserted directly (they are
  * the point of these operators), and the rolling correlation is
  * recomputed with a sliding Scala window.
  */
class SemanticsShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_join_nullsafe: the NULL bucket joins NULL and counts match") {
    val ev = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def buckets(t: String): Map[Option[Long], Long] =
      ev.filter(_._1 == t).map { case (_, v) =>
        if (v < 5) None else Some(math.floor(v / 50).toLong)
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val a = buckets("click"); val b = buckets("view")
    val want = a.keySet.intersect(b.keySet)
      .map(k => k -> (a(k), b(k))).toMap
    val got = q("q_join_nullsafe").collect().map { r =>
      val k = if (r.isNullAt(0)) None else Some(r.getLong(0))
      k -> (r.getLong(1), r.getLong(2))
    }.toMap
    assert(got == want)
    assert(got.contains(None), "the NULL bucket must survive the join")
  }

  test("q_explode_outer keeps token-less documents as NULL rows") {
    val rows = q("q_explode_outer").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    val docIds = rows.map(_._1).distinct
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(docIds.length.toLong == nDocs, "every document is represented")
    val nullDocs = rows.filter(_._2.isEmpty).map(_._1).toSet
    assert(nullDocs.nonEmpty, "some documents have no long tokens")
    // a doc has EITHER one null row OR only token rows, never both
    nullDocs.foreach { id =>
      assert(rows.count(_._1 == id) == 1, s"doc $id has null + tokens")
    }
    rows.filter(r => r._2.isDefined).foreach { case (_, Some(t)) =>
      assert(t.length >= 7)
    case _ => ()
    }
  }

  test("q_fill_forward carries the last observation and only that") {
    val rows = q("q_fill_forward").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.exists(r => r._3.isEmpty && r._4.isDefined),
      "some gap must actually be filled")
    rows.groupBy(_._1).values.foreach { g =>
      var lastSeen: Option[Double] = None
      g.sortBy(_._2).foreach { case (t, h, obs, filled) =>
        if (obs.isDefined) lastSeen = obs
        assert(filled == lastSeen, s"$t@$h: filled=$filled lastSeen=$lastSeen")
      }
    }
  }

  test("q_roll_corr equals a sliding-window Pearson recomputation") {
    val h = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(expr("unix_micros(ts) DIV 3600000000").as("hr"))
      .agg(count(when(col("event_type") === "click", 1)).as("c"),
        count(when(col("event_type") === "view", 1)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val byHr = h.map(t => t._1 -> (t._2, t._3)).toMap
    val want = h.flatMap { case (hr, _, _) =>
      val frame = (hr - 23 to hr).flatMap(byHr.get)
      if (frame.length != 24) None
      else {
        val xs = frame.map(_._1.toDouble); val ys = frame.map(_._2.toDouble)
        val n = 24.0
        val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum -
          xs.sum * ys.sum
        val den = math.sqrt(
          (n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
            (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
        Some(hr -> (if (den == 0) None else Some(num / den)))
      }
    }.toMap
    val got = q("q_roll_corr").collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap
    assert(got.keySet == want.keySet)
    for ((hr, wr) <- want) (got(hr), wr) match {
      case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-5, s"hour $hr")
      case (g, w)             => assert(g == w, s"hour $hr null mismatch")
    }
  }
}
