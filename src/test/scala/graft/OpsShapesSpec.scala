package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation + plan gates for the pipeline-operations
  * batch (q_skew_report / q_integrity / q_holt / q_changepoint /
  * q_readability / q_snapshot_diff): sequential-scan recomputation of
  * the two integer recurrences, brute-force audits for the rest, and
  * pins on the broadcast-dimension anti joins.
  */
class OpsShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val hourly: Map[String, Seq[(Long, Long)]] =
    graft.core.Tables.events(spark, sf)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) DIV 3600000000").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap

  test("q_holt equals a sequential Holt recurrence") {
    val want = hourly.map { case (t, series) =>
      var l = 1000L * series.head._2
      var b = 0L
      series.tail.foreach { case (_, cnt) =>
        val nl = (l + b + 1000L * cnt) / 2 // JVM / truncates like DIV
        b = (b + (nl - l)) / 2
        l = nl
      }
      t -> (l, b)
    }
    val got = q("q_holt").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    q("q_holt").collect().foreach { r =>
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3), "forecast = l + b")
    }
  }

  test("q_changepoint equals a sequential CUSUM scan") {
    val want = hourly.map { case (t, series) =>
      val n = series.length
      val mean = (1000L * series.map(_._2).sum) / n
      var s = 0L; var smax = Long.MinValue; var hmax = 0L
      series.foreach { case (hour, cnt) =>
        s = math.max(0L, s + 1000L * cnt - mean)
        if (s > smax) { smax = s; hmax = hour }
      }
      t -> (mean, smax, hmax)
    }
    val got = q("q_changepoint").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == want)
  }

  test("q_skew_report stats match a direct per-key recomputation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
    def stats(i: Int): (Long, Long, Long) = {
      val counts = li.map(_.getLong(i)).groupBy(identity).map(_._2.length)
      (counts.size.toLong, counts.sum.toLong, counts.max.toLong)
    }
    val want = Map("l_orderkey" -> stats(0), "l_partkey" -> stats(1),
      "l_suppkey" -> stats(2))
    val got = q("q_skew_report").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
  }

  test("q_integrity: totals match and the synthetic FKs are orphan-free") {
    val rows = q("q_integrity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nLi = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val nOrd = spark.read.parquet(s"$sf/orders.parquet").count()
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows("lineitem->orders")._1 == nLi)
    assert(rows("lineitem->part")._1 == nLi)
    assert(rows("orders->customer")._1 == nOrd)
    assert(rows("customer->nation")._1 == nCust)
    assert(rows.values.forall(_._2 == 0L), s"unexpected orphans: $rows")
  }

  test("q_readability equals a direct Flesch computation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val words = text.split(" ", -1).length
      val sentences = math.max(1, text.count(c => "!.?".contains(c)))
      val syllables = "[aeiouy]+".r.findAllIn(text.toLowerCase).length
      val flesch = 206.835 - 1.015 * (words.toDouble / sentences) -
        84.6 * (syllables.toDouble / words)
      id -> (words.toLong, sentences.toLong, syllables.toLong, flesch)
    }.toMap
    val got = q("q_readability").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == want.keySet)
    for ((id, (w, s, syl, f)) <- want) {
      assert(got(id)._1 == w, s"doc $id words")
      assert(got(id)._2 == s, s"doc $id sentences")
      assert(got(id)._3 == syl, s"doc $id syllables")
      assert(math.abs(got(id)._4 - f) < 1e-5, s"doc $id flesch")
    }
  }

  test("q_snapshot_diff classes partition the customer union") {
    val rows = q("q_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def us(s: String) =
      java.time.Instant.parse(s).getEpochSecond * 1000000L
    val aks = o.filter(t => t._2 >= us("1995-01-01T00:00:00Z") &&
      t._2 < us("1999-01-01T00:00:00Z")).map(_._1).toSet
    val bks = o.filter(t => t._2 >= us("1997-01-01T00:00:00Z") &&
      t._2 < us("2001-01-01T00:00:00Z")).map(_._1).toSet
    assert(rows.getOrElse("added", 0L) == (bks -- aks).size.toLong)
    assert(rows.getOrElse("removed", 0L) == (aks -- bks).size.toLong)
    assert(rows.values.sum == (aks ++ bks).size.toLong)
  }

  test("q_integrity plan: five anti joins, dimension probes broadcast") {
    // at sf0.001 even the orders side sits under the broadcast
    // threshold, so Spark's size statistics broadcast the fact-fact
    // check too — the size-driven choice is the point; the pinned
    // property is the anti-join shape and the broadcast dims
    val s = q("q_integrity").queryExecution.executedPlan.toString
    val antiLines = s.linesIterator.filter(_.contains("LeftAnti")).toList
    assert(antiLines.size == 5, s"expected 5 anti joins:\n$s")
    assert(antiLines.count(_.contains("Broadcast")) >= 4,
      "dimension anti joins not broadcast:\n" + antiLines.mkString("\n"))
  }

  test("q_filter_funnel: stage counts match a brute-force recompute") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("text", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val langs = Set("en", "de", "fr", "es")
    val prefixCount = docs.map(_._1.take(40)).groupBy(identity)
      .map { case (p, o) => p -> o.length }
    val flags = docs.map { case (text, lang, nChars) =>
      val fLen = nChars >= 200 && nChars <= 2000
      val fLang = langs(lang)
      val fTok = "[a-z]+".r.findAllIn(text.toLowerCase).length >= 50
      (fLen, fLang, fTok, prefixCount(text.take(40)) == 1)
    }
    val expected = (docs.length.toLong,
      flags.count(_._1).toLong,
      flags.count(f => f._1 && f._2).toLong,
      flags.count(f => f._1 && f._2 && f._3).toLong,
      flags.count(f => f._1 && f._2 && f._3 && f._4).toLong)
    val r = q("q_filter_funnel").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == expected)
    // the funnel is monotone by construction
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2) &&
      r.getLong(2) >= r.getLong(3) && r.getLong(3) >= r.getLong(4))
  }
}
