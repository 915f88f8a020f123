package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation + plan gates for the recsys / series-
  * compression batch (q_item_recs / q_sax / q_assortativity /
  * q_source_terms): brute-force recomputation at sf0.001 and
  * WindowGroupLimit pins for the per-group top-k windows.
  */
class RecsysShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_item_recs equals brute-force cosine-normalized co-occurrence") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val po = li.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.length.toLong).toMap
    val cooc = collection.mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ps =>
      val sorted = ps.sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        cooc((sorted(i), sorted(j))) = cooc.getOrElse((sorted(i), sorted(j)), 0L) + 1
    }
    val sym = cooc.toSeq.flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c))
    }
    val want = sym.groupBy(_._1).flatMap { case (p, cands) =>
      cands.map { case (_, qq, c) =>
        (p, qq, c, c.toDouble / math.sqrt((po(p) * po(qq)).toDouble))
      }.sortBy(t => (-t._4, t._2)).take(5).zipWithIndex
        .map { case ((_, qq, c, s), i) => (p, i + 1L) -> (qq, c, s) }
    }
    val got = q("q_item_recs").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == want.keySet)
    for ((k, (qq, c, s)) <- want) {
      assert(got(k)._1 == qq, s"$k neighbor")
      assert(got(k)._2 == c, s"$k cooc")
      assert(math.abs(got(k)._3 - s) < 1e-5, s"$k score")
    }
  }

  test("q_sax: alphabet is a-d and segment counts match the hour span") {
    val rows = q("q_sax").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sax = r.getString(2)
      assert(sax.length == r.getLong(1), "one symbol per segment")
      assert(sax.forall("abcd".contains(_)), s"bad alphabet: $sax")
      // quartile binning: no single symbol may cover everything
      assert(sax.distinct.length >= 2, s"degenerate SAX string: $sax")
    }
  }

  test("q_assortativity equals a direct Pearson over edge degree pairs") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pairs = li.map { case (ok, sk) => (ord(ok), 100000L + sk) }.distinct
    val edges = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val xs = edges.map(e => deg(e._1).toDouble)
    val ys = edges.map(e => deg(e._2).toDouble)
    val n = edges.length.toDouble
    val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum
    val den = math.sqrt((n * xs.map(x => x * x).sum - xs.sum * xs.sum) *
      (n * ys.map(y => y * y).sum - ys.sum * ys.sum))
    val row = q("q_assortativity").collect().head
    assert(row.getLong(0) == edges.length.toLong)
    assert(math.abs(row.getDouble(1) - num / den) < 1e-5)
  }

  test("q_source_terms equals brute-force c-TF-IDF top-5") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tc = docs.flatMap { case (src, text) =>
      text.split(" ", -1).map(w => (src, w))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val st = tc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val df = tc.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ns = st.size.toDouble
    val want = tc.keys.groupBy(_._1).flatMap { case (src, keys) =>
      keys.map { case (_, w) =>
        val score = (tc((src, w)).toDouble / st(src)) * math.log(ns / df(w))
        (w, tc((src, w)), score)
      }.toSeq.sortBy(t => (-t._3, t._1)).take(5).zipWithIndex
        .map { case ((w, c, s), i) => (src, i + 1L) -> (w, c, s) }
    }
    val got = q("q_source_terms").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == want.keySet)
    for ((k, (w, c, s)) <- want) {
      assert(got(k)._1 == w, s"$k token")
      assert(got(k)._2 == c, s"$k count")
      assert(math.abs(got(k)._3 - s) < 1e-5, s"$k score")
    }
  }

  test("per-group top-5 windows compile to WindowGroupLimit") {
    for (key <- Seq("q_item_recs", "q_source_terms")) {
      val s = q(key).queryExecution.executedPlan.toString
      assert(s.contains("WindowGroupLimit"),
        s"$key missing partial top-k:\n" + s.take(3000))
    }
  }
}
