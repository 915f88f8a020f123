package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import TestSpark.{sf, spark}

/** Gates for the round-13 wave-2 operators: robust/nonparametric stats
  * (q_mann_whitney, q_cusum, q_theil_sen), fuzzy dictionary matching
  * (q_fuzzy_join + the JaroWinkler expression), weighted shortest paths
  * (q_sssp), Spark-4 feature coverage (q_variant_json, q_collation),
  * and quantile normalization (q_quantile_norm).
  *
  * Discipline (Round12/13ShapesSpec precedent): every closed-form or
  * window-trick implementation is replayed driver-side from first
  * principles — the sequential recursion, the brute-force ranking, the
  * textbook Bellman-Ford — and compared against the declared query's
  * output, so an algebra slip fails here before the oracle diff sees it.
  */
class Round13Wave2Spec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ------------------------------------------------------------ jaro-winkler

  test("JaroWinkler expression matches DuckDB-pinned reference values") {
    // constants verified against DuckDB v1.0 jaro_winkler_similarity
    // (round-13 notes): includes both boost regimes — CRATE/TRACE sits
    // ABOVE the 0.7 threshold with a zero-length common prefix (boost
    // multiplies to nothing), abcd/dcba sits below (no boost applied)
    val cases = Seq(
      ("martha", "marhta") -> 0.9611111111111111,
      ("DWAYNE", "DUANE") -> 0.8400000000000001,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("abcd", "dcba") -> 0.5,
      ("small ring", "smal ring") -> 0.98,
      ("a", "") -> 0.0,
      ("ab", "ab") -> 1.0,
      ("abcdef", "fedcba") -> 0.38888888888888884,
      ("CRATE", "TRACE") -> 0.7333333333333334,
      ("hello", "world") -> 0.4666666666666666)
    for (((a, b), want) <- cases) {
      val got = graft.functions.JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == want, s"jw($a, $b): got $got want $want")
      // symmetry (Jaro is symmetric; Winkler prefix is too)
      val rev = graft.functions.JaroWinkler.compute(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(rev == got, s"jw not symmetric on ($a, $b)")
    }
  }

  test("q_fuzzy_join recovers every corrupted part name at threshold 0.9") {
    val rows = q("q_fuzzy_join").collect()
    val nParts = spark.read.parquet(s"$sf/part.parquet").count()
    assert(rows.length == nParts,
      s"expected one match per part: ${rows.length} vs $nParts")
    assert(rows.forall(_.getAs[Boolean]("correct")),
      "a corrupted name matched the wrong dictionary entry")
    assert(rows.forall(_.getAs[Double]("sim") >= 0.9))
  }

  // ------------------------------------------------------------ mann-whitney

  test("q_mann_whitney matches a driver-side rank replay") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("value").isNotNull)
      .select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val ctrl = ev.filter(_._1 == "view").map(_._2)
    val out = q("q_mann_whitney").collect()
      .map(r => r.getAs[String]("treatment") ->
        (r.getAs[Long]("n_treat"), r.getAs[Long]("n_ctrl"), r.getAs[Long]("u2")))
      .toMap
    val treatments = ev.map(_._1).distinct.filter(_ != "view").sorted
    assert(out.keySet == treatments.toSet)
    for (t <- treatments) {
      val treat = ev.filter(_._1 == t).map(_._2)
      // textbook tie-averaged ranks over the combined sample, doubled
      val all = (treat.map((_, true)) ++ ctrl.map((_, false))).sortBy(_._1)
      var i = 0
      var r2treat = 0L // 2 × ranksum of the treatment group
      while (i < all.length) {
        var j = i
        while (j < all.length && all(j)._1 == all(i)._1) j += 1
        val doubledAvgRank = (i + 1) + j // 2 × (i+1 + j) / 2 over 1-based ranks
        for (k <- i until j if all(k)._2) r2treat += doubledAvgRank
        i = j
      }
      val n1 = treat.length.toLong
      val u2 = r2treat - n1 * (n1 + 1)
      assert(out(t) == ((n1, ctrl.length.toLong, u2)),
        s"$t: query ${out(t)} vs replay ${(n1, ctrl.length.toLong, u2)}")
    }
  }

  // ------------------------------------------------------------------ cusum

  test("q_cusum prefix-min identity matches the sequential clipped recursion") {
    val hours = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000)) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = q("q_cusum").collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n_hours"), r.getAs[Long]("n_alarms"),
        Option(r.getAs[java.lang.Long]("first_alarm_hr")).map(_.toLong),
        r.getAs[Double]("max_stat"))).toMap
    for (t <- hours.map(_._1).distinct.sorted) {
      val series = hours.filter(_._1 == t).map(x => (x._2, x._3)).sortBy(_._1)
      val n = series.length.toLong
      val tot = series.map(_._2).sum
      // the sequential definition the window form must equal:
      // S_i = max(0, S_{i-1} + D_i), alarm when S_i > 8T (scaled by 4n)
      var s = 0L; var mx = 0L; var alarms = 0L
      var first: Option[Long] = None
      for ((hr, c) <- series) {
        s = math.max(0L, s + (4L * n * c - 5L * tot))
        if (s > 8L * tot) { alarms += 1; if (first.isEmpty) first = Some(hr) }
        mx = math.max(mx, s)
      }
      val wantMax = BigDecimal(mx.toDouble / (4L * n).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(t) == ((n, alarms, first, wantMax)),
        s"$t: query ${out(t)} vs replay ${(n, alarms, first, wantMax)}")
    }
  }

  // -------------------------------------------------------------- theil-sen

  test("q_theil_sen matches brute-force pairwise-slope order statistics") {
    val hours = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000)) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = q("q_theil_sen").collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n_pairs"), r.getAs[Double]("slope_med"))).toMap
    for (t <- hours.map(_._1).distinct.sorted) {
      val series = hours.filter(_._1 == t).map(x => (x._2, x._3)).sortBy(_._1)
      val slopes = for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield ((series(j)._2 - series(i)._2).toDouble /
          (series(j)._1 - series(i)._1).toDouble,
          series(i)._1, series(j)._1)
      val sorted = slopes.sortBy(x => (x._1, x._2, x._3))
      val np = sorted.length
      val med = sorted((np + 1) / 2 - 1)._1
      val wantMed = BigDecimal(med)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(t) == ((np.toLong, wantMed)),
        s"$t: query ${out(t)} vs replay ${(np.toLong, wantMed)}")
    }
  }

  // ------------------------------------------------------------------- sssp

  test("q_sssp matches a driver-side 6-round Bellman-Ford replay") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_suppkey")
    val pairs = orders.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (col("l_suppkey") + 100000L).as("sup"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .map { case (s0, d0) => (s0, d0, (s0 + d0) % 7 + 1) }
    val root = pairs.map(_._1).min
    var dist = Map(root -> 0L)
    for (_ <- 1 to 6) {
      val relaxed = edges.flatMap { case (s0, d0, w) =>
        dist.get(s0).map(x => d0 -> (x + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    val want = dist.toSeq
      .map { case (node, dd) =>
        (if (node < 100000L) "customer" else "supplier", dd, node)
      }
      .groupBy(x => (x._1, x._2))
      .map { case ((side, dd), vs) =>
        (side, dd, vs.length.toLong, vs.map(_._3).min)
      }.toSet
    val got = q("q_sssp").collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"sssp spectrum mismatch:\n got  $got\n want $want")
  }

  // ---------------------------------------------------- spark-4 feature keys

  test("q_variant_json: variant path equals the string-JSON path (q_json_fns parity)") {
    val v = q("q_variant_json").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_k"))).toMap
    val j = q("q_json_fns").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_k"))).toMap
    assert(v == j, "variant extraction diverged from string JSON extraction")
    val schemas = q("q_variant_json").collect()
      .map(_.getAs[String]("variant_schema")).distinct.toSeq
    assert(schemas == Seq("OBJECT<k: BIGINT>"), schemas.mkString(","))
  }

  test("q_collation: collated grouping collapses exactly the case variants") {
    val rows = q("q_collation").collect()
    assert(rows.map(_.getAs[String]("key_lc")).toSeq ==
      rows.map(_.getAs[String]("key_lc")).toSeq.sorted)
    assert(rows.forall(_.getAs[Long]("n_variants") == 2L),
      "every type should appear in exactly 2 case variants by construction")
    val ick = rows.filter(_.getAs[Boolean]("has_ick"))
      .map(_.getAs[String]("key_lc")).toSeq
    assert(ick == Seq("click"), s"collated contains('ICK') matched: $ick")
  }

  // ------------------------------------------------------------ mann-kendall

  test("q_mann_kendall matches a brute-force sign-pair replay") {
    val hours = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000)) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = q("q_mann_kendall").collect().map(r => r.getAs[String]("event_type") ->
      (r.getAs[Long]("n_hours"), r.getAs[Long]("s"), r.getAs[Double]("z"))).toMap
    for (t <- hours.map(_._1).distinct.sorted) {
      val series = hours.filter(_._1 == t).map(x => (x._2, x._3)).sortBy(_._1)
      var s = 0L
      for (i <- series.indices; j <- (i + 1) until series.length)
        s += java.lang.Long.signum(series(j)._2 - series(i)._2)
      val n = series.length.toLong
      val tcorr = series.groupBy(_._2).values
        .map(g => { val tt = g.length.toLong; tt * (tt - 1) * (2 * tt + 5) }).sum
      val z =
        if (s == 0) 0.0
        else BigDecimal((s.toDouble - (if (s > 0) 1.0 else -1.0)) /
          math.sqrt((n * (n - 1) * (2 * n + 5) - tcorr).toDouble / 18.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(t) == ((n, s, z)), s"$t: ${out(t)} vs ${(n, s, z)}")
    }
  }

  // ------------------------------------------------------------ spatial join

  test("q_spatial_join grid candidates are lossless vs a sweep-line brute force") {
    val pts = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id").as("id"),
        expr("((event_id % 9973) * 2654435761) % 1000000").as("x"),
        expr("((event_id % 7919) * 2654435761) % 1000000").as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0)))
      .sortBy(_._1)
    // sweep over x (sorted), brute-check the y band — every ε-pair, no grid
    val xs = pts.map(_._1)
    var nPairs = 0L; var sumDist = 0L
    for (k <- pts.indices) {
      val (x, y, id) = pts(k)
      var m = k + 1
      while (m < pts.length && xs(m) - x < 500) {
        val (x2, y2, id2) = pts(m)
        if (math.abs(y2 - y) < 500 && id != id2) {
          nPairs += 1
          sumDist += math.max(math.abs(x2 - x), math.abs(y2 - y))
        }
        m += 1
      }
    }
    val out = q("q_spatial_join").collect()
    assert(out.map(_.getAs[Long]("n_pairs")).sum == nPairs,
      s"pair count: grid ${out.map(_.getAs[Long]("n_pairs")).sum} vs brute $nPairs")
    assert(out.map(_.getAs[Long]("sum_dist")).sum == sumDist,
      "distance sum diverged — a pair was found twice or missed")
  }

  // -------------------------------------------------------- schema evolution

  test("q_schema_evolution: merged scan nulls exactly the absent generation columns") {
    val rows = q("q_schema_evolution").collect()
      .map(r => r.getAs[Long]("p") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("lang_nulls"),
          r.getAs[Long]("nchars_nulls")))).toMap
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    // p=1 wrote (doc_id, lang): n_chars is the nulled gap; p=2 vice versa
    assert(rows(1L) == ((nDocs, 0L, nDocs)), s"p=1: ${rows(1L)}")
    assert(rows(2L) == ((nDocs, nDocs, 0L)), s"p=2: ${rows(2L)}")
  }

  // ---------------------------------------------------------- hodges-lehmann

  test("q_hodges_lehmann matches brute-force pairwise-difference order stats") {
    val hours = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000)) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ctrl = hours.filter(_._1 == "view").map(x => (x._2, x._3)).sortBy(_._1)
    val out = q("q_hodges_lehmann").collect().map(r =>
      r.getAs[String]("treatment") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("hl_diff"))).toMap
    for (t <- hours.map(_._1).distinct.filter(_ != "view").sorted) {
      val treat = hours.filter(_._1 == t).map(x => (x._2, x._3)).sortBy(_._1)
      val diffs = (for {
        (ht, ct) <- treat; (hv, cv) <- ctrl
      } yield (ct - cv, ht, hv)).sortBy(x => (x._1, x._2, x._3))
      val np = diffs.length
      val hl = diffs((np + 1) / 2 - 1)._1
      assert(out(t) == ((np.toLong, hl)), s"$t: ${out(t)} vs ${(np, hl)}")
    }
  }

  // -------------------------------------------------------------------- mmd

  test("q_mmd: planted shift dominates the natural arm; xx term is shared") {
    val rows = q("q_mmd").collect()
      .map(r => r.getAs[String]("arm") ->
        ((r.getAs[Double]("k_xx"), r.getAs[Double]("mmd2")))).toMap
    // both arms share the same x sample, so the xx kernel mean is identical
    assert(rows("natural")._1 == rows("shifted")._1, "k_xx should be shared")
    // the sensitivity contract: a planted +0.5 shift on one dimension
    // must move MMD² far above the natural label-0-vs-label-1 level
    assert(rows("shifted")._2 > 2.0 * rows("natural")._2,
      s"planted shift not detected: $rows")
    assert(rows("natural")._2 >= 0.0 && rows("shifted")._2 >= 0.0,
      s"biased-V MMD² must be nonnegative: $rows")
  }

  // ------------------------------------------------------------------ binseg

  test("q_binseg matches a driver-side exhaustive split search; SSE ladder holds") {
    val hours = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"),
        expr("(unix_micros(CAST(ts AS TIMESTAMP)) - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000)) DIV 3600000000").as("hr"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = q("q_binseg").collect().map(r => r.getAs[String]("event_type") ->
      ((r.getAs[Long]("cp1_hr"), r.getAs[Double]("sse0"),
        r.getAs[Double]("sse1"), r.getAs[Double]("sse2")))).toMap
    def sse(xs: Seq[Long]): Double = {
      val ss = xs.map(x => x * x).sum.toDouble
      val sm = xs.sum.toDouble
      ss - sm * sm / xs.length
    }
    for (t <- hours.map(_._1).distinct.sorted) {
      val xs = hours.filter(_._1 == t).sortBy(_._2).map(_._3).toSeq
      val hrs = hours.filter(_._1 == t).sortBy(_._2).map(_._2).toSeq
      val splits = (1 until xs.length)
        .map(i => (sse(xs.take(i)) + sse(xs.drop(i)), i))
      val (bestCost, bestI) = splits.minBy(x => (x._1, x._2))
      val (cp1, sse0, sse1, sse2) = out(t)
      assert(cp1 == hrs(bestI - 1), s"$t: cp1 $cp1 vs ${hrs(bestI - 1)}")
      val r6 = (x: Double) => BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(sse1 == r6(bestCost), s"$t: sse1 $sse1 vs ${r6(bestCost)}")
      assert(sse0 == r6(sse(xs)), s"$t: sse0")
      assert(sse0 > sse1 && sse1 > sse2,
        s"$t: SSE ladder violated ($sse0, $sse1, $sse2)")
    }
  }

  // -------------------------------------------------------------------- lof

  test("q_lof matches a driver-side textbook LOF replay") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet")
      .orderBy("vec_id").limit(1024)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
    def d2(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) {
        val diff = x(i).toDouble - y(i).toDouble; s += diff * diff; i += 1
      }
      s
    }
    val ids = pts.map(_._1)
    val knn: Map[Long, Seq[(Long, Double)]] = pts.map { case (p, ep, _) =>
      p -> pts.filter(_._1 != p)
        .map { case (o, eo, _) => (o, d2(ep, eo)) }
        .sortBy(x => (x._2, x._1)).take(5).toSeq
    }.toMap
    val kdist = knn.map { case (p, nn) => p -> nn.map(_._2).max }
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val lrd = knn.map { case (p, nn) =>
      p -> (5.0 / nn.map { case (o, dd) =>
        r9(math.max(dd, kdist(o))) }.sum.toDouble)
    }
    val lofv = knn.map { case (p, nn) =>
      p -> (nn.map { case (o, _) => r9(lrd(o) / lrd(p)) }.sum.toDouble / 5.0)
    }
    val r6 = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // sort on the SAME 6-decimal-rounded key both engines emit — the
    // unrounded order can flip near-ties at the LIMIT boundary
    val want = lofv.toSeq.map { case (p, l) => (p, r6(l)) }
      .sortBy { case (p, l) => (-l, p) }.take(15)
    val got = q("q_lof").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("lof"))).toSeq
    assert(got == want, s"\n got  $got\n want $want")
  }

  // ------------------------------------------------------------- slice audit

  test("q_slice_audit matches a driver replay and runs as ONE Expand pass") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source", "n_chars")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nn = docs.length.toLong
    val sTot = docs.map(_._3).sum
    val ss = docs.map(x => x._3 * x._3).sum
    def z(nS: Long, sumS: Long): Double = BigDecimal(
      (sumS.toDouble * nn - sTot.toDouble * nS) * math.sqrt(nS.toDouble) /
        (nS.toDouble * math.sqrt(nn.toDouble * ss - sTot.toDouble * sTot.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val slices =
      docs.groupBy(_._1).map { case (l, g) =>
        (l, "*", g.length.toLong, g.map(_._3).sum) }.toSeq ++
      docs.groupBy(_._2).map { case (src, g) =>
        ("*", src, g.length.toLong, g.map(_._3).sum) }.toSeq ++
      docs.groupBy(x => (x._1, x._2)).map { case ((l, src), g) =>
        (l, src, g.length.toLong, g.map(_._3).sum) }.toSeq
    val want = slices.map { case (l, src, n, sm) => (l, src, n, sm, z(n, sm)) }
      .sortBy(x => (-math.abs(x._5), x._1, x._2)).take(10)
    val got = q("q_slice_audit").collect().map(r => (r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want, s"\n got  $got\n want $want")
    // the three slice granularities share ONE scan through a single
    // Expand (never three scans); the global-moment row is its own
    // (column-pruned) scan — two scans total
    val plan = q("q_slice_audit").queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length >= 1 &&
      "Scan parquet".r.findAllIn(plan).length == 2,
      s"expected slices scan + moments scan, one Expand:\n$plan")
  }

  // ---------------------------------------------------------- quantile norm

  test("q_quantile_norm matches a driver-side nearest-rank replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val poolSorted = docs.map(_._3).sorted
    val n = poolSorted.length.toLong
    val want = docs.groupBy(_._1).map { case (src, ds) =>
      val ns = ds.length.toLong
      val ranked = ds.sortBy(d => (d._3, d._2)).zipWithIndex
      val mapped = ranked.map { case (_, i) =>
        val ix = ((2L * (i + 1) - 1L) * n) / (2L * ns) + 1L
        poolSorted((ix - 1).toInt)
      }
      src -> (ns, ds.map(_._3).sum, mapped.sum, mapped.min, mapped.max)
    }
    val got = q("q_quantile_norm").collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == want, s"quantile-norm replay mismatch")
  }
}
