package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation + plan gates for the classic-pattern batch
  * (q_union_evolve / q_mode / q_streaks / q_dedup_survivor /
  * q_string_agg).
  */
class PatternShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_streaks equals brute-force island detection") {
    val days = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) / 86400000000L)
          .cast("long").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val streaks = days.groupBy(_._1).toSeq.flatMap { case (ck, rows) =>
      val ds = rows.map(_._2).sorted
      val islands = ds.foldLeft(List.empty[List[Long]]) {
        case (acc, d) if acc.nonEmpty && acc.head.head == d - 1 =>
          (d :: acc.head) :: acc.tail
        case (acc, d) => List(d) :: acc
      }
      islands.map(i => (ck, i.length.toLong, i.min))
    }
    val want = streaks.sortBy(t => (-t._2, t._1, t._3)).take(100)
      .map(t => (t._1, t._2))
    val got = q("q_streaks").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want)
  }

  test("q_mode equals brute-force per-cohort majority") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0) % 10, r.getString(1)))
    val want = ev.groupBy(_._1).map { case (c, rows) =>
      val (v, n) = rows.groupBy(_._2).view.mapValues(_.length).toSeq
        .minBy { case (value, cnt) => (-cnt, value) }
      c -> (v, n.toLong)
    }
    val got = q("q_mode").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("q_dedup_survivor keeps the longest copy per fingerprint") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val groups = docs.groupBy(t => t._2.toLowerCase.replaceAll("\\s+", " "))
    val want = groups.values.map { g =>
      val s = g.minBy(t => (-t._3, t._1))
      s._1 -> g.length.toLong
    }.toMap
    val got = q("q_dedup_survivor").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == want)
  }

  test("q_union_evolve: drift columns are null exactly where absent") {
    val rows = q("q_union_evolve").collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length.toLong == n)
    rows.foreach { r =>
      val even = r.getLong(0) % 2 == 0
      assert(r.isNullAt(r.fieldIndex("n_chars")) != even, s"n_chars @ $r")
      assert(r.isNullAt(r.fieldIndex("lang")) == even, s"lang @ $r")
      assert(r.isNullAt(r.fieldIndex("long_doc")) == even, s"long_doc @ $r")
    }
  }

  test("q_string_agg output is alphabetical within each region") {
    q("q_string_agg").collect().foreach { r =>
      val parts = r.getString(2).split(",").toSeq
      assert(parts.length.toLong == r.getLong(1))
      assert(parts == parts.sorted, s"unsorted listagg: ${r.getString(2)}")
    }
  }

  test("q_mode / q_dedup_survivor compile to WindowGroupLimit") {
    for (key <- Seq("q_mode", "q_dedup_survivor")) {
      val s = q(key).queryExecution.executedPlan.toString
      assert(s.contains("WindowGroupLimit"),
        s"$key missing partial top-1:\n" + s.take(3000))
    }
  }
}
