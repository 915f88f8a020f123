package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic gates for the round-12 snapshot keys contract-synced in
  * round 13: the Brier/Murphy decomposition (q_brier) and the
  * interval-union sweep (q_interval_coverage).
  */
class Round13ShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_brier matches a driver-side replay and the generalized Murphy identity") {
    import org.apache.spark.sql.functions._
    val rows = q("q_brier").collect()
    assert(rows.length == 1)
    val r = rows.head
    val brier = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    // driver-side replay from the raw events
    val ky = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type").isin("click", "view"))
      .select(expr("CAST(floor(value * 100) AS BIGINT) % 100").as("k"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n = ky.length.toDouble
    val ybar = ky.map(_._2).sum / n
    val eBrier = ky.map { case (k, y) => val d = k / 100.0 - y; d * d }.sum / n
    val bins = ky.groupBy(_._1 / 10)
    val eRel = bins.values.map { b =>
      val nb = b.length.toDouble
      val fb = b.map(_._1).sum / (100.0 * nb)
      val yb = b.map(_._2).sum / nb
      nb * (fb - yb) * (fb - yb)
    }.sum / n
    val eRes = bins.values.map { b =>
      val nb = b.length.toDouble
      val yb = b.map(_._2).sum / nb
      nb * (yb - ybar) * (yb - ybar)
    }.sum / n
    val eUnc = ybar * (1.0 - ybar)
    // the query rounds each readout to 6 decimals independently; its
    // internal per-bin terms round on the 9-grid, so allow that grid
    assert(math.abs(brier - eBrier) < 2e-6, s"brier $brier != replay $eBrier")
    assert(math.abs(rel - eRel) < 2e-6, s"reliability $rel != replay $eRel")
    assert(math.abs(res - eRes) < 2e-6, s"resolution $res != replay $eRes")
    assert(math.abs(unc - eUnc) < 2e-6, s"uncertainty $unc != replay $eUnc")
    // generalized Murphy identity: with a NON-constant forecast inside
    // each bin (k deciles), brier = rel - res + unc + E[var(f | bin)]
    // - 2 E[cov(f, y | bin)]; the textbook rel - res + unc form is
    // exact only when f is constant per bin
    val wbv = bins.values.map { b =>
      val nb = b.length.toDouble
      val fb = b.map(_._1).sum / (100.0 * nb)
      b.map { case (k, _) => val d = k / 100.0 - fb; d * d }.sum
    }.sum / n
    val wcov = bins.values.map { b =>
      val nb = b.length.toDouble
      val fb = b.map(_._1).sum / (100.0 * nb)
      val yb = b.map(_._2).sum / nb
      b.map { case (k, y) => (k / 100.0 - fb) * (y - yb) }.sum
    }.sum / n
    assert(math.abs(eRel - eRes + eUnc + wbv - 2 * wcov - eBrier) < 1e-9,
      s"generalized Murphy identity broken: " +
        s"$eRel - $eRes + $eUnc + $wbv - 2*$wcov != $eBrier")
    assert(res <= unc + 5e-7, s"resolution $res exceeds uncertainty $unc")
  }

  test("q_interval_coverage matches a brute-force driver-side interval union") {
    import org.apache.spark.sql.functions._
    val got = q("q_interval_coverage").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_islands"), r.getAs[Long]("covered_us"),
          r.getAs[Long]("raw_us"))))
      .toMap
    // brute force: per user, sort intervals and merge overlapping ones
    val iv = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("s"),
        (unix_micros(col("ts").cast("timestamp"))
          + expr("CAST(floor(value * 60) AS BIGINT)") * 1000000L).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(got.keySet == iv.keySet)
    iv.foreach { case (u, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      var islands = 0L
      var covered = 0L
      var raw = 0L
      var curLo = Long.MinValue
      var curHi = Long.MinValue
      sorted.foreach { case (s0, e0) =>
        raw += e0 - s0
        if (islands == 0L || s0 > curHi) {
          if (islands > 0L) covered += curHi - curLo
          islands += 1; curLo = s0; curHi = e0
        } else if (e0 > curHi) curHi = e0
      }
      if (islands > 0L) covered += curHi - curLo
      assert(got(u) == ((islands, covered, raw)),
        s"user $u: got ${got(u)}, brute force ($islands, $covered, $raw)")
    }
  }

  test("q_betweenness rows are invariant to the join strategy (hint vs forced shuffle)") {
    // VERDICT r12 #4: the BSP frontier joins dropped their forced
    // broadcast hints beyond hop 0 and rely on AQE. Pin that the rows
    // do not depend on the chosen strategy by disabling every
    // broadcast conversion and comparing against the default plan.
    val normal = q("q_betweenness").collect().map(_.toSeq).toSeq
    val shuffled = TestSpark.withConfValue(Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")) {
      q("q_betweenness").collect().map(_.toSeq).toSeq
    }
    assert(normal == shuffled)
    assert(normal.nonEmpty)
  }

  test("q_interval_coverage raw time always >= covered time (overlap ratio >= 1)") {
    q("q_interval_coverage").collect().foreach { r =>
      assert(r.getAs[Long]("raw_us") >= r.getAs[Long]("covered_us"))
      val ratio = r.getAs[Double]("overlap_ratio")
      if (!r.isNullAt(r.fieldIndex("overlap_ratio"))) assert(ratio >= 1.0 - 1e-9)
    }
  }
}
