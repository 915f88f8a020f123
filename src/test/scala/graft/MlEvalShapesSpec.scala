package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation + plan gates for the ML-evaluation batch
  * (q_class_weights / q_knn_classify / q_centroid_confusion /
  * q_silhouette / q_powerlaw / q_mutual_info): brute-force Scala
  * recomputation from collected base rows at sf0.001, and pins on the
  * broadcast-centroid / broadcast-probe scale shapes.
  */
class MlEvalShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val vecs: Array[(Long, Int, Array[Float])] =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))

  private def d2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    s
  }

  test("q_knn_classify equals brute-force leave-one-out 5-NN vote") {
    val probes = vecs.filter(_._1 % 25 == 0)
    val want = probes.map { case (pid, tl, pv) =>
      val nn = vecs.filter(_._1 != pid)
        .map { case (cid, cl, cv) => (d2(pv, cv), cid, cl) }
        .sortBy(t => (t._1, t._2)).take(5)
      val (predLabel, nVotes) = nn.groupBy(_._3).view
        .mapValues(_.length).toSeq
        .minBy { case (l, v) => (-v, l) }
      pid -> (tl.toLong, predLabel.toLong, nVotes.toLong)
    }.toMap
    val got = q("q_knn_classify").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
  }

  test("q_centroid_confusion equals brute-force nearest-centroid counts") {
    val byLabel = vecs.groupBy(_._2)
    val dims = vecs.head._3.length
    val cents = byLabel.map { case (l, vs) =>
      val c = new Array[Double](dims)
      vs.foreach(v => (0 until dims).foreach(i => c(i) += v._3(i).toDouble))
      l -> c.map(_ / vs.length)
    }
    def dist(v: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - c(i); s += d * d; i += 1 }
      s
    }
    val want = vecs.map { case (_, tl, v) =>
      val pred = cents.map { case (l, c) => (dist(v, c), l) }.min._2
      (tl.toLong, pred.toLong)
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = q("q_centroid_confusion").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("q_silhouette matches a direct centroid-silhouette computation") {
    val byLabel = vecs.groupBy(_._2)
    val dims = vecs.head._3.length
    val cents = byLabel.map { case (l, vs) =>
      val c = new Array[Double](dims)
      vs.foreach(v => (0 until dims).foreach(i => c(i) += v._3(i).toDouble))
      l -> c.map(_ / vs.length)
    }
    def dist(v: Array[Float], c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - c(i); s += d * d; i += 1 }
      math.sqrt(s)
    }
    val want = vecs.groupBy(_._2).map { case (l, vs) =>
      val sils = vs.map { case (_, _, v) =>
        val a = dist(v, cents(l))
        val b = cents.collect { case (ol, c) if ol != l => dist(v, c) }.min
        (b - a) / math.max(a, b)
      }
      l.toLong -> sils.sum / sils.length
    }
    val got = q("q_silhouette").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == want.keySet)
    for ((l, s) <- want)
      assert(math.abs(got(l) - s) < 1e-5, s"label $l silhouette")
  }

  test("q_class_weights: weights satisfy sklearn's balanced identity") {
    val rows = q("q_class_weights").collect()
    val n = vecs.length.toDouble
    val k = rows.length.toDouble
    rows.foreach { r =>
      val cnt = vecs.count(_._2 == r.getLong(0))
      assert(r.getLong(1) == cnt.toLong)
      assert(math.abs(r.getDouble(3) - n / (k * cnt)) < 1e-5)
    }
  }

  test("q_powerlaw: buckets partition parts; alpha matches MLE") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey").collect().map(_.getLong(0))
    val counts = li.groupBy(identity).map(_._2.length).toSeq
    val rows = q("q_powerlaw").collect()
    assert(rows.map(_.getLong(1)).sum == counts.length.toLong)
    val alpha = 1 + counts.length / counts.map(c => math.log(c / 0.5)).sum
    assert(math.abs(rows.head.getDouble(5) - alpha) < 1e-5)
    rows.foreach { r =>
      val bucket = r.getLong(0)
      assert(63 - java.lang.Long.numberOfLeadingZeros(r.getLong(2)) == bucket)
      assert(63 - java.lang.Long.numberOfLeadingZeros(r.getLong(3)) == bucket)
    }
  }

  test("q_mutual_info contributions sum to the true MI") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getString(1), r.getLong(0) % 4))
    val n = ev.length.toDouble
    val cells = ev.groupBy(identity).map { case (k, v) => k -> v.length }
    val rm = ev.groupBy(_._1).map { case (k, v) => k -> v.length }
    val km = ev.groupBy(_._2).map { case (k, v) => k -> v.length }
    val mi = cells.map { case ((t, c), cnt) =>
      val p = cnt / n
      p * (math.log(cnt * n / (rm(t).toDouble * km(c))) / math.log(2))
    }.sum
    val got = q("q_mutual_info").collect().map(_.getDouble(4)).sum
    assert(math.abs(got - mi) < 1e-4, s"MI got $got want $mi")
  }

  test("q_ndcg equals brute-force graded ranking metrics") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double) = new JBD(x).setScale(6, RoundingMode.HALF_UP).doubleValue
    def disc(r: Int) = new JBD(1.0 / (math.log(r + 1.0) / math.log(2.0)))
      .setScale(9, RoundingMode.HALF_UP)
    val probes = vecs.filter(_._1 < 20)
    val corpus = vecs.filter(_._1 >= 20)
    val want = probes.map { case (pid, pl, pv) =>
      val scored = corpus.map { case (cid, cl, cv) =>
        val rel = math.max(0, 2 - math.abs(pl - cl))
        (cid, r6(cos(pv, cv)), rel, Seq(0, 1, 3)(rel))
      }
      val sys = scored.sortBy { case (cid, c, _, _) => (-c, cid) }.take(10)
      val ideal = scored.sortBy { case (cid, _, rel, _) => (-rel, cid) }.take(10)
      def dcg(rows: Array[(Long, Double, Int, Int)]): JBD =
        rows.zipWithIndex.map { case ((_, _, _, g), i) =>
          disc(i + 1).multiply(new JBD(g))
        }.foldLeft(JBD.ZERO)(_.add(_))
      val (d, id) = (dcg(sys), dcg(ideal))
      val hits = sys.count(_._3 >= 1).toLong
      val first2 = sys.zipWithIndex.collectFirst { case ((_, _, 2, _), i) => i + 1 }
      pid -> (hits,
        first2.map(r => r6(1.0 / r)).getOrElse(0.0),
        r6(d.doubleValue / id.doubleValue))
    }.toMap
    val got = q("q_ndcg").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(6)))
      .toMap
    assert(got.keySet == want.keySet)
    for ((k, (wh, wm, wn)) <- want) {
      val (gh, gm, gn) = got(k)
      assert(gh == wh, s"probe $k hits@10: $gh vs $wh")
      assert(math.abs(gm - wm) < 1e-9, s"probe $k mrr: $gm vs $wm")
      assert(math.abs(gn - wn) < 2e-6, s"probe $k ndcg: $gn vs $wn")
      assert(gn >= 0.0 && gn <= 1.0, s"probe $k ndcg out of range: $gn")
    }
  }

  test("q_f1_macro is consistent with the confusion matrix and its macro row") {
    val cm = q("q_centroid_confusion").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val labels = cm.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = labels.map { l =>
      val tp = cm.getOrElse((l, l), 0L)
      val fp = cm.collect { case ((t, p), n) if p == l && t != l => n }.sum
      val fn = cm.collect { case ((t, p), n) if t == l && p != l => n }.sum
      l -> (tp, fp, fn,
        if (tp + fp == 0) 0.0 else r6(tp.toDouble / (tp + fp)),
        r6(tp.toDouble / (tp + fn)),
        r6(2.0 * tp / (2 * tp + fp + fn)))
    }.toMap
    val rows = q("q_f1_macro").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    labels.foreach(l => assert(rows(l) == want(l), s"label $l"))
    // macro row: count sums are exact; metric averages within one grid
    // step of the plain-double mean of the per-class round-6 values
    val (mtp, mfp, mfn, mp, mr, mf) = rows(-1L)
    assert(mtp == want.values.map(_._1).sum)
    assert(mfp == want.values.map(_._2).sum)
    assert(mfn == want.values.map(_._3).sum)
    assert(math.abs(mp - want.values.map(_._4).sum / labels.size) < 1e-6)
    assert(math.abs(mr - want.values.map(_._5).sum / labels.size) < 1e-6)
    assert(math.abs(mf - want.values.map(_._6).sum / labels.size) < 1e-6)
    // all vectors are classified exactly once
    assert(mtp + mfn == vecs.length)
  }

  test("q_centroid_confusion / q_knn_classify plans broadcast the small side") {
    val s1 = q("q_centroid_confusion").queryExecution.executedPlan.toString
    assert(s1.contains("BroadcastNestedLoopJoin") ||
      s1.contains("BroadcastHashJoin"), s1.take(3000))
    val s2 = q("q_knn_classify").queryExecution.executedPlan.toString
    assert(s2.contains("BroadcastNestedLoopJoin") ||
      s2.contains("BroadcastHashJoin"), s2.take(3000))
  }

  test("q_logreg_step: plain-Scala replay, and the step never raises loss") {
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0) == "purchase", r.getDouble(1)))
    val n = evs.length
    val np = evs.count(_._1)
    // exact-decimal gradient numerator for the value feature
    val s1 = evs.map { case (y, v) =>
      BigDecimal(if (y) "-0.5" else "0.5") *
        BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val vmax = evs.map(_._2).max
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w0 = r9(-0.5 * (0.5 - np.toDouble / n))
    val w1 = r9(-0.5 * (s1.toDouble / n / vmax))
    val lossAfter = {
      val terms = evs.map { case (y, v) =>
        val z = w0 + w1 * (v / vmax)
        BigDecimal(r9(math.log(1 + math.exp(z)) - (if (y) 1 else 0) * z))
      }.sum
      BigDecimal(terms.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val row = q("q_logreg_step").collect().head
    assert(row.getLong(0) == n && row.getLong(1) == np)
    assert(row.getDouble(2) == w0 && row.getDouble(3) == w1)
    assert(row.getDouble(5) == lossAfter)
    // the pinned training-step contract: one eta=1/2 step from w=0
    // must not increase the mean log-loss
    assert(row.getDouble(5) <= row.getDouble(4))
  }

  test("q_adaboost_round: plain-Scala replay of both stumps and the reweighting") {
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0) == "purchase", r.getDouble(1)))
    val lo = evs.map(_._2).min; val hi = evs.map(_._2).max
    def bin(v: Double): Int =
      if (hi == lo) 0 else math.min(9, math.floor((v - lo) / (hi - lo) * 10).toInt)
    val cells = evs.groupBy(e => bin(e._2)).map { case (b, es) =>
      b -> (es.count(_._1).toLong, es.count(!_._1).toLong)
    }
    def cellAt(b: Int) = cells.getOrElse(b, (0L, 0L))
    val gt = cells.values.map(_._1).sum; val bt = cells.values.map(_._2).sum
    val n = gt + bt
    def stat(thr: Int) = {
      val (lg, lb) = (0 to thr).map(cellAt).foldLeft((0L, 0L)) {
        case ((a, b2), (c, d2)) => (a + c, b2 + d2)
      }
      (lg, lb, gt - lg, bt - lb)
    }
    val errs = (0 to 8).map { t =>
      val (lg, lb, rg, rb) = stat(t)
      t -> ((if (lg > lb) lb else lg) + (if (rg > rb) rb else rg))
    }
    val (thr1, err1) = errs.minBy { case (t, e) => (e, t) }
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val alpha = if (err1 == 0 || err1 == n) 0.0
      else r9(0.5 * math.log((n - err1).toDouble / err1))
    val (wr, ww) = (r9(math.exp(-alpha)), r9(math.exp(alpha)))
    val (lg1, lb1, rg1, rb1) = stat(thr1)
    val (predl, predr) = (lg1 > lb1, rg1 > rb1)
    val wcells = (0 to 9).map { b =>
      val (g, bad) = cellAt(b)
      val p = if (b <= thr1) predl else predr
      b -> (BigDecimal(r6(g * (if (p) wr else ww))),
        BigDecimal(r6(bad * (if (!p) wr else ww))))
    }.toMap
    val wgt = wcells.values.map(_._1).sum; val wbt = wcells.values.map(_._2).sum
    val werrs = (0 to 8).map { t =>
      val (wlg, wlb) = (0 to t).map(wcells).foldLeft(
        (BigDecimal(0), BigDecimal(0))) { case ((a, b2), (c, d2)) => (a + c, b2 + d2) }
      val (wrg, wrb) = (wgt - wlg, wbt - wlb)
      t -> ((if (wlg > wlb) wlb else wlg) + (if (wrg > wrb) wrb else wrg))
    }
    val (thr2, werr2) = werrs.minBy { case (t, e) => (e, t) }
    val row = SparkEntry.queries("q_adaboost_round")(spark, sf).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == thr1 && row.getLong(2) == err1)
    assert(row.getDouble(3) == alpha)
    assert(row.getLong(4) == thr2)
    assert(row.getDouble(5) == werr2.toDouble)
    // boosting sanity: a non-degenerate stump votes with positive weight
    assert(alpha > 0.0)
  }

  private def bd9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("q_naive_bayes equals a plain-Scala multinomial NB replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String): Seq[String] = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
    val tr = docs.filter(_._1 % 5 != 0)
      .map(d => (d._1, d._2, toks(d._3))).filter(_._3.nonEmpty)
    val te = docs.filter(_._1 % 5 == 0)
      .map(d => (d._1, d._2, toks(d._3))).filter(_._3.nonEmpty)
    val cnt = tr.flatMap { case (_, l, ws) => ws.map(w => (l, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val v = cnt.keys.map(_._2).toSet.size
    val nTr = tr.length
    val prior = tr.groupBy(_._2).view
      .mapValues(ds => bd9(math.log(ds.length.toDouble / nTr))).toMap
    val langs = tot.keys.toSeq.sorted
    val want = te.map { case (_, actual, ws) =>
      val k = ws.groupBy(identity).view.mapValues(_.length).toMap
      val pred = langs.map { l =>
        val sl = k.map { case (w, kk) =>
          bd9(math.log((cnt.getOrElse((l, w), 0L) + 1).toDouble / (tot(l) + v))) * kk
        }.sum
        (l, prior(l) + sl)
      }.minBy { case (l, sc) => (-sc, l) }._1
      (actual, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = q("q_naive_bayes").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("q_target_encode equals a direct shrinkage computation") {
    val brand = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val f = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_extendedprice").collect()
      .map(r => (brand(r.getLong(0)),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val ng = f.length
    val gmean = f.map(_._2).sum.toDouble / ng
    val want = f.groupBy(_._1).map { case (b, rows) =>
      val n = rows.length
      val st = rows.map(_._2).sum.toDouble
      b -> (n.toLong, st / n, (st + 20 * gmean) / (n + 20))
    }
    val got = q("q_target_encode").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet)
    for ((b, (n, raw, enc)) <- want) {
      assert(got(b)._1 == n, s"$b support")
      assert(math.abs(got(b)._2 - raw) < 1e-6, s"$b raw mean")
      assert(math.abs(got(b)._3 - enc) < 1e-6, s"$b encoding")
      // shrinkage property: the encoding sits strictly between the raw
      // category mean and the global mean (or equals both when n >> m)
      val loB = math.min(raw, gmean) - 1e-9
      val hiB = math.max(raw, gmean) + 1e-9
      assert(got(b)._3 >= loB && got(b)._3 <= hiB, s"$b not shrunk")
    }
  }
}
