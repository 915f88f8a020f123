package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation + plan gates for the statistics-at-scale
  * batch (q_dp_count / q_bootstrap_ci / q_ks_test / q_calibration):
  * direct recomputation of the KS statistic and the Laplace noise
  * identity, structural checks on the bootstrap interval and the
  * calibration quintiles, and the no-global-window pin for the
  * bucketed ECDF.
  */
class StatsScaleShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_ks_test equals a brute-force ECDF max-gap") {
    val ev = graft.core.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 10).toLong))
    val a = ev.filter(_._1 == "click").map(_._2).sorted
    val b = ev.filter(_._1 == "view").map(_._2).sorted
    val grid = (a ++ b).distinct.sorted
    val d = grid.map { g =>
      math.abs(a.count(_ <= g).toDouble / a.length -
        b.count(_ <= g).toDouble / b.length)
    }.max
    val row = q("q_ks_test").collect().head
    assert(row.getLong(0) == a.length.toLong)
    assert(row.getLong(1) == b.length.toLong)
    assert(math.abs(row.getDouble(2) - d) < 1e-6)
  }

  test("q_dp_count noise is bounded Laplace and counts stay exact") {
    val exact = graft.core.Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = q("q_dp_count").collect()
    assert(rows.map(_.getString(0)).toSet == exact.keySet)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)), "exact count column")
      val noise = r.getDouble(2) - r.getLong(1)
      // b=1 Laplace from a 48-bit uniform: |noise| <= ln(2^48)
      assert(math.abs(noise) <= 34.0, s"implausible noise $noise")
      assert(noise != 0.0, "noise must actually perturb")
    }
  }

  test("q_bootstrap_ci intervals are ordered and bracket the plain mean") {
    val means = graft.core.Tables.events(spark, sf)
      .groupBy("event_type").agg(avg("value").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = q("q_bootstrap_ci").collect()
    assert(rows.map(_.getString(0)).toSet == means.keySet)
    rows.foreach { r =>
      val (lo, med, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(lo <= med && med <= hi, s"unordered CI: $lo $med $hi")
      assert(hi > lo, "degenerate interval")
      val m = means(r.getString(0))
      assert(m > lo - (hi - lo) && m < hi + (hi - lo),
        s"plain mean $m far outside CI [$lo, $hi]")
    }
  }

  test("q_calibration: quintile bins are balanced and exhaustive") {
    val rows = q("q_calibration").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val n = rows.map(_.getLong(1)).sum
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(n == nVec, "every vector lands in exactly one bin")
    // quintiles: no bin may hold more than ~40% of mass even with ties
    rows.foreach(r => assert(r.getLong(1) <= n * 2 / 5 + 1,
      s"bin ${r.getLong(0)} overloaded"))
    // mean confidence must be nondecreasing across bins
    val confs = rows.sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(confs.zip(confs.tail).forall { case (x, y) => x <= y })
  }

  test("q_regression equals a direct OLS fit") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_type"),
        ((unix_micros(col("ts")) / 3600000000L).cast("long") % 24).as("x"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble, r.getDouble(2)))
    val want = ev.groupBy(_._1).map { case (t, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      t -> (slope, (sy - slope * sx) / n)
    }
    val got = q("q_regression").collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    for ((t, (sl, ic)) <- want) {
      assert(math.abs(got(t)._1 - sl) < 1e-5, s"$t slope")
      assert(math.abs(got(t)._2 - ic) < 1e-4, s"$t intercept")
    }
  }

  test("q_auc equals the brute-force pairwise probability") {
    // independent recomputation with plain-double centroids: the
    // query's exact-decimal pipeline agrees to ~1e-9 per score, far
    // inside the 1e-3 tolerance on the aggregate statistic
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getInt(1), r.getSeq[Float](2).map(_.toDouble).toArray))
    val dims = vecs.head._2.length
    val cents = vecs.groupBy(_._1).map { case (l, vs) =>
      val c = new Array[Double](dims)
      vs.foreach(v => (0 until dims).foreach(i => c(i) += v._2(i)))
      l -> c.map(_ / vs.length)
    }
    def dist(v: Array[Double], c: Array[Double]): Double =
      math.sqrt(v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
    val scored = vecs.map { case (tl, v) =>
      val ds = cents.toSeq.map { case (l, c) => (dist(v, c), l) }.sorted
      val hit = ds.head._2 == tl
      (hit, ds(1)._1 / (ds.head._1 + ds(1)._1))
    }
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val want = wins.toDouble / (2.0 * pos.length * neg.length)
    val row = q("q_auc").collect().head
    assert(row.getLong(0) == pos.length.toLong)
    assert(row.getLong(1) == neg.length.toLong)
    assert(math.abs(row.getDouble(2) - want) < 1e-3, s"auc vs $want")
  }

  test("q_ks_test plan has no unpartitioned window (bucketed ECDF)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = q("q_ks_test").queryExecution.optimizedPlan
    val bad = lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, "global-sort window in KS ECDF")
  }

  test("q_psi equals a direct binned-drift computation") {
    val split = java.time.Instant.parse("2024-01-16T00:00:00Z")
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("ts"), col("value")).collect()
      .map(r => (r.getTimestamp(0).toInstant, r.getDouble(1)))
    val ref = ev.filter(_._1.isBefore(split)).map(_._2)
    val cur = ev.filterNot(_._1.isBefore(split)).map(_._2)
    val lo = ref.min
    val hi = ref.max
    def bin(v: Double): Int =
      if (hi == lo) 0
      else math.max(0, math.min(9, math.floor((v - lo) / (hi - lo) * 10).toInt))
    val rn = Array.fill(10)(0L); ref.foreach(v => rn(bin(v)) += 1)
    val cn = Array.fill(10)(0L); cur.foreach(v => cn(bin(v)) += 1)
    val rt = rn.sum; val ct = cn.sum
    val terms = (0 until 10).map { b =>
      val p = (rn(b) + 1).toDouble / (rt + 10)
      val q = (cn(b) + 1).toDouble / (ct + 10)
      (p - q) * math.log(p / q)
    }
    val rows = q("q_psi").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      assert(r.getLong(1) == rn(b), s"bin $b ref count")
      assert(r.getLong(2) == cn(b), s"bin $b cur count")
      assert(math.abs(r.getDouble(3) - terms(b)) < 1e-9, s"bin $b term")
      // (p-q) and ln(p/q) always share sign, so each term is >= 0
      assert(r.getDouble(3) >= 0.0, s"bin $b negative psi term")
    }
    assert(math.abs(rows.head.getDouble(4) - terms.sum) < 1e-6, "psi total")
  }
}
