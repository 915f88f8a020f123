package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic gates for the round-6 curation/eval additions:
  * containment dedup, substring dedup, BPE pair mining, time-RANGE
  * windows and ANN recall. Each is recomputed (or bounded) in plain
  * Scala from the raw tables, independent of the oracle hash-compare.
  */
class CurationExtrasSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(key: String) = SparkEntry.queries(key)(spark, sf)

  test("q_distinct_n: ratios match a plain-Scala recomputation and bound each other") {
    val rows = run("q_distinct_n").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => r.getString(0) ->
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    for (n <- 1 to 3) {
      val grams = docs.flatMap { case (_, w) => w.sliding(n).filter(_.length == n).map(_.mkString(" ")) }
      val (tot, dist, ratio) = rows(("(all)", n.toLong))
      assert(tot == grams.length.toLong, s"n=$n total")
      // declared semantics (r9): distinct over 48-bit md5 gram hashes,
      // so the shuffle carries 8-byte keys; recompute the same way and
      // pin that hashing lost nothing at this SF (no collisions)
      val hashDist = grams.map(g => java.lang.Long.parseLong(
        md5hex(g).substring(0, 12), 16)).distinct.length.toLong
      assert(dist == hashDist, s"n=$n hashed distinct")
      assert(hashDist == grams.distinct.length.toLong,
        s"n=$n: 48-bit gram-hash collision in fixtures")
      assert(ratio == BigDecimal(dist.toDouble / tot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // higher n -> strictly more diversity on natural-ish text
    val r1 = rows(("(all)", 1L))._3
    val r3 = rows(("(all)", 3L))._3
    assert(r3 > r1, "distinct-3 should exceed distinct-1")
    // per-source rows partition the corpus totals
    val srcTotals = rows.collect { case ((s, 2L), (t, _, _)) if s != "(all)" => t }.sum
    assert(srcTotals == rows(("(all)", 2L))._1)
  }

  test("q_dedup_contain: every original is fully contained in its planted twin") {
    val rows = run("q_dedup_contain").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val docIds = graft.core.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    assert(docIds.nonEmpty)
    docIds.foreach { id =>
      val c = rows.get((id, id + 100000))
      assert(c.contains(1.0), s"containment(orig $id, twin) must be exactly 1.0")
    }
    // asymmetry is real: some twin→orig pairs must score < 1 (the twin
    // has shingles the original lacks) yet still pass the 3/5 gate
    val back = rows.keys.count { case (a, b) => a == b + 100000 }
    assert(back > 0, "reverse pairs present")
  }

  // content-defined window helpers mirroring q_dedup_substring's
  // anchor rule: position p anchors iff md5(8-gram at p) ≡ 0 (mod 32)
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def cdcWins(s: String): Set[String] =
    (1 to s.length - 63).iterator
      .filter(p => java.lang.Long.parseLong(
        md5hex(s.substring(p - 1, p + 7)).substring(0, 12), 16) % 32 == 0)
      .map(p => s.substring(p - 1, p + 63)).toSet

  test("q_dedup_substring: reported pairs genuinely share an anchored window") {
    val pairs = run("q_dedup_substring").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty, "the corpus has verbatim reuse")
    val text = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.take(10).foreach { case (a, b, n) =>
      val shared = cdcWins(text(a)).intersect(cdcWins(text(b)))
      assert(shared.size == n, s"pair ($a,$b) shared-window count")
    }
  }

  test("q_dedup_substring: anchors are offset-independent (the CDC point)") {
    // the same passage planted at DIFFERENT offsets must still share
    // windows — the failure mode a fixed-stride grid cannot avoid
    val texts = graft.core.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val passage = texts.find { t =>
      // needs an interior anchor clear of both passage edges
      t.length >= 200 && cdcWins(t.substring(0, 200)).nonEmpty
    }.map(_.substring(0, 200)).getOrElse(fail("no anchored passage"))
    val inA = "left pad " + passage + " tail"
    val inB = "a differently sized preamble here: " + passage + " other"
    val shared = cdcWins(inA).intersect(cdcWins(inB))
    assert(shared.nonEmpty,
      "misaligned copies of one passage must share anchored windows")
    assert(shared.forall(passage.contains),
      "shared windows come from the common passage")
  }

  test("q_bpe_pairs: top-20 matches a plain-Scala recount") {
    val got = run("q_bpe_pairs").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val texts = graft.core.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      "[a-z]+".r.findAllIn(t.toLowerCase).filter(_.length >= 2)
        .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1)
    }
    val pairCnt = scala.collection.mutable.Map.empty[String, Long]
    freq.foreach { case (w, f) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairCnt(p) = pairCnt.getOrElse(p, 0L) + f
      }
    }
    val expected = pairCnt.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == expected)
  }

  test("q_window_range: trailing 1-hour frame matches per-user scan") {
    val got = run("q_window_range").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    val value = graft.core.Tables.events(spark, sf)
      .select("event_id", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byUser = got.groupBy(_._2)
    byUser.take(5).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      sorted.foreach { case (eid, _, us, sum1h, n1h) =>
        val inFrame = sorted.filter(e => e._3 <= us && e._3 >= us - 3600000000L)
        assert(inFrame.length.toLong == n1h, "frame count")
        val expSum = inFrame.map(e => BigDecimal(value(e._1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
        assert(sum1h == expSum.toDouble, s"frame sum at event $eid")
      }
    }
  }

  test("q_ann_pq: 10 ranked candidates per probe, ADC distances monotone") {
    val rows = run("q_ann_pq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byProbe.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to 10L), "ranks 1..10")
      assert(sorted.sliding(2).forall(p => p(0)._4 <= p(1)._4),
        "ADC distance non-decreasing with rank")
      assert(sorted.forall(_._4 >= 0.0), "squared distances non-negative")
      assert(sorted.map(_._3).distinct.length == 10, "distinct candidates")
    }
  }

  test("q_shuffle_shards: a permutation — every doc once, contiguous positions") {
    val rows = run("q_shuffle_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val allDocs = graft.core.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == allDocs, "every doc exactly once")
    assert(rows.length == allDocs.size)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 16)
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length),
        s"shard $shard positions contiguous")
    }
  }

  test("q_mix_temperature: weights normalize, temperature flattens the mix") {
    val rows = run("q_mix_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    val total = rows.map(_._2).sum
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5, "mix weights sum to 1")
    assert(math.abs(rows.map(_._5).sum - total) <= rows.length, "effective counts ≈ total")
    // τ=1/2 flattens: every below-average slice gains share, every
    // above-average slice loses share
    rows.foreach { case (lang, n, _, w, _) =>
      val share = n.toDouble / total
      if (share < 1.0 / rows.length) assert(w > share, s"$lang upweighted")
      if (share > 1.0 / rows.length) assert(w < share, s"$lang damped")
    }
  }

  test("q_cross_corr: lag-0 correlation matches a plain-Scala recomputation") {
    val got = run("q_cross_corr").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.keySet == (-3L to 3L).toSet)
    got.values.foreach { case (_, r) => r.foreach(v => assert(math.abs(v) <= 1.0)) }
    // recompute lag 0 directly from raw events
    val hours = graft.core.Tables.events(spark, sf)
      .select(expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) DIV 3600000000").as("h"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hmin = hours.map(_._1).min
    val hmax = hours.map(_._1).max
    val cx = hours.filter(_._2 == "click").groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cy = hours.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val s0 = (hmin to hmax).map(h => (cx.getOrElse(h, 0L), cy.getOrElse(h, 0L)))
    val n = s0.length.toLong
    val (sx, sy) = (s0.map(_._1).sum, s0.map(_._2).sum)
    val sxy = s0.map(p => p._1 * p._2).sum
    val sxx = s0.map(p => p._1 * p._1).sum
    val syy = s0.map(p => p._2 * p._2).sum
    val expected = BigDecimal((n * sxy - sx * sy).toDouble /
      math.sqrt(((n * sxx - sx * sx) * (n * syy - sy * sy)).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0L)._1 == n)
    assert(got(0L)._2.contains(expected), "lag-0 Pearson r")
  }

  test("q_minhash_est: band candidates imply est ≥ 4/16; error accounting exact") {
    val rows = run("q_minhash_est").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (nMatch, est, exact, err) =>
      assert(nMatch >= 4, "a shared band means ≥ 4 matching perms")
      assert(est == nMatch / 16.0)
      assert(math.abs(err - math.abs(BigDecimal(est - exact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)) < 1e-9)
      assert(exact >= 0.0 && exact <= 1.0)
    }
    val meanErr = rows.map(_._4).sum / rows.length
    assert(meanErr < 0.2, s"16-perm estimator mean |err| $meanErr sane")
  }

  test("q_html_strip: body text recovered verbatim from the markup") {
    val clean = run("q_html_strip").collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    docs.foreach { case (id, orig) =>
      // the pipeline collapses runs of spaces, so the expectation must
      // too (the 16-char h1 slice can end on a word boundary)
      val expected = (orig.substring(0, math.min(16, orig.length)).toUpperCase +
        " " + orig + " & more").replaceAll(" +", " ")
      assert(clean(id) == expected,
        s"doc $id: extractor must be lossless on body text")
    }
  }

  test("q_dedup_sweep: counts monotone in threshold, exact dups survive all") {
    val rows = run("q_dedup_sweep").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("J>=0.50", "J>=0.60", "J>=0.70", "J>=0.80"))
    assert(rows.sliding(2).forall(p => p(0)._2 >= p(1)._2),
      "pair counts non-increasing with threshold")
    assert(rows.sliding(2).forall(p => p(0)._3 >= p(1)._3),
      "planted recall non-increasing with threshold")
    // doc_id % 4 == 0 twins are EXACT dups (0 appended words): they
    // pass every threshold, so even J>=0.80 keeps at least that many
    val nExact = graft.core.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 4 === 0).count()
    assert(rows.last._3 >= nExact * 9 / 10,
      "exact-dup twins survive the highest threshold (minus band misses)")
    assert(rows.head._2 > rows.last._2, "the sweep genuinely discriminates")
  }

  test("q_sketch_merge: estimates bounded, small groups exact, merge row present") {
    val rows = run("q_sketch_merge").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.exists(_._1 == "ALL"), "merged scope present")
    val exactAll = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey").distinct().count()
    assert(rows.find(_._1 == "ALL").get._2 == exactAll, "merged exact count")
    rows.foreach { case (scope, nExact, nEst, errPct) =>
      if (nExact < 128) assert(nEst == nExact.toDouble,
        s"$scope below k must be exact")
      // KMV with k=128 has rsd ≈ 9%; 35% is ~4σ — beyond it the
      // estimator (not luck) is broken
      assert(errPct < 35.0, s"$scope estimate error $errPct%")
      assert(nEst > 0)
    }
    val grpSum = rows.filter(_._1 != "ALL").map(_._2).sum
    assert(grpSum == exactAll, "priorities partition the key space")
  }

  test("q_sample_quantile: sample medians near exact, merge row present") {
    val rows = run("q_sample_quantile").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.exists(_._1 == "ALL"))
    val (vMin, vMax) = {
      val vs = graft.core.Tables.events(spark, sf)
        .select("value").collect().map(_.getDouble(0))
      (vs.min, vs.max)
    }
    rows.foreach { case (scope, n, exact, est, err) =>
      assert(n > 0)
      assert(exact >= vMin && exact <= vMax, s"$scope exact median in range")
      assert(est >= vMin && est <= vMax, s"$scope sample median in range")
      assert(err == math.abs(BigDecimal(est - exact)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), s"$scope err")
      // a 128-point uniform sample's median is a consistent estimator;
      // an error beyond a third of the value range means a broken arm
      assert(err < (vMax - vMin) / 3, s"$scope error $err implausible")
    }
  }

  test("q_url_normalize: canonical forms are clean and conserve all docs") {
    val rows = run("q_url_normalize").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == nDocs, "every doc's URL lands in one group")
    rows.foreach { case (norm, nVar, nRaw, _) =>
      assert(norm == norm.toLowerCase, "canonical form lowercased")
      assert(!norm.contains("utm_"), "tracking params stripped")
      assert(!norm.contains("#"), "fragments stripped")
      assert(!norm.endsWith("?") && !norm.endsWith("&"), "separators tidied")
      assert(nRaw <= nVar, "raw-form count bounded by variant count")
    }
    assert(rows.exists(_._3 > 1), "normalization genuinely collapses variants")
  }

  test("plan gates: PQ codebook and cross-corr grid joins broadcast") {
    val pq = run("q_ann_pq").queryExecution.executedPlan.toString
    assert(pq.contains("BroadcastHashJoin"), "codebook joins broadcast")
    assert(!pq.contains("CartesianProduct"), "no unbounded cross join")
    val cc = run("q_cross_corr").queryExecution.executedPlan.toString
    assert(!cc.contains("SortMergeJoin"),
      "the bounded hour grid must join broadcast, not shuffle")
  }

  test("recall keys: one row per probe, hits within bounds, recall = hits/10") {
    for (key <- Seq("q_ann_recall", "q_pq_recall")) {
      val rows = run(key).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L), key)
      rows.foreach { case (_, hits, rec) =>
        assert(hits >= 0 && hits <= 10, key)
        assert(rec == hits / 10.0, key)
      }
      assert(rows.exists(_._2 > 0), s"$key: an index this coarse still " +
        "finds SOME true neighbors — all-zero recall means a broken arm")
    }
  }

  test("q_boilerplate: flagged counts reconcile with a plain-Scala shingle df") {
    val rows = run("q_boilerplate").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // independent recount: 8-word shingles per doc, corpus df, flags
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    val shingles = docs.map { case (id, w) =>
      id -> (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" "))
    }
    val df = shingles.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length }
    shingles.filter(_._2.nonEmpty).foreach { case (id, gs) =>
      val (n, flagged, retained) = rows(id)
      assert(n == gs.length, s"doc $id shingle count")
      assert(flagged == gs.count(df(_) >= 2), s"doc $id flagged count")
      assert(retained == BigDecimal(1.0 - flagged.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"doc $id ratio")
    }
    assert(rows.values.exists(_._2 > 0),
      "no boilerplate flagged at all — the threshold stopped discriminating")
  }

  test("q_link_jaccard: scores bounded, shared ≤ min degree, sorted desc") {
    val rows = run("q_link_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // sf0.001 has 10 suppliers → all 45 pairs qualify; larger sfs cap at 50
    assert(rows.length >= 10 && rows.length <= 50)
    rows.foreach { case (s1, s2, shared, unioned, j) =>
      assert(s1 < s2)
      assert(shared >= 1 && shared <= unioned)
      assert(j > 0.0 && j <= 1.0)
      assert(math.abs(j - shared.toDouble / unioned) < 1e-6)
    }
    val js = rows.map { case (_, _, sh, un, _) => sh.toDouble / un }
    assert(js.zip(js.tail).forall { case (a, b) => a >= b }, "not sorted")
  }

  test("q_perplexity: NLL matches a plain-Scala bigram-LM recomputation") {
    val rows = run("q_perplexity").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    val bigrams = docs.flatMap { case (id, w) =>
      w.zip(w.drop(1)).map(p => (id, p))
    }
    val c1 = bigrams.groupBy(_._2._1).map { case (k, v) => k -> v.length }
    val c12 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length }
    docs.filter(_._2.length >= 2).foreach { case (id, w) =>
      val bs = w.zip(w.drop(1))
      val (n, nll) = rows(id)
      assert(n == bs.length, s"doc $id bigram count")
      // same grid: per-bigram round-9 ln term, exact decimal sum
      val s = bs.map { b =>
        BigDecimal(math.log(c1(b._1).toDouble / c12(b)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expect = BigDecimal((s * 1000000000).toLong.toDouble / 1000000000 / bs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(nll == expect, s"doc $id nll")
    }
  }

  test("q_perplexity_kn: NLL matches a plain-Scala Kneser-Ney recomputation") {
    val rows = run("q_perplexity_kn").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    val bigrams = docs.flatMap { case (id, w) =>
      w.zip(w.drop(1)).map(p => (id, p))
    }
    val c1 = bigrams.groupBy(_._2._1).map { case (k, v) => k -> v.length }
    val c12 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length }
    val n1ps = c12.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.length }
    val n1pp = c12.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.length }
    val bTot = c12.size
    docs.filter(_._2.length >= 2).foreach { case (id, w) =>
      val bs = w.zip(w.drop(1))
      val (n, nll) = rows(id)
      assert(n == bs.length, s"doc $id bigram count")
      // identical op order to both engines' p chain, round-9 ln terms
      val s = bs.map { b =>
        val p = (c12(b).toDouble - 0.75) / c1(b._1) +
          ((0.75 * n1ps(b._1)) / c1(b._1)) * (n1pp(b._2).toDouble / bTot)
        BigDecimal(-math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expect = BigDecimal((s * 1000000000).toLong.toDouble / 1000000000 / bs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(nll == expect, s"doc $id nll")
      // KN probability mass over SEEN successors of any context is < 1
      // (the discount holds mass back) — sanity that smoothing is real
    }
    // KN must diverge from MLE somewhere (otherwise the discount is a no-op)
    val mle = run("q_perplexity").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(docs.exists { case (id, w) =>
      w.length >= 2 && mle.get(id).exists(v => rows(id)._2 != v)
    })
  }

  test("q_perplexity_kn3: NLL matches a plain-Scala trigram-KN recomputation") {
    val rows = run("q_perplexity_kn3").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toVector)
    val tris = docs.flatMap { case (id, w) =>
      w.lazyZip(w.drop(1)).lazyZip(w.drop(2)).map((a, b, c) => (id, (a, b, c)))
    }
    val bigrams = docs.flatMap { case (_, w) => w.zip(w.drop(1)) }
    val c12 = tris.groupBy(t => (t._2._1, t._2._2)).map { case (k, v) => k -> v.length }
    val n1ps = tris.map(_._2).distinct.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.map(_._3).distinct.length }
    val c123 = tris.groupBy(_._2).map { case (k, v) => k -> v.length }
    val triTypes = c123.keys.toSeq
    val n1p23 = triTypes.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.length }
    val n1p2dot = triTypes.groupBy(_._2).map { case (k, v) => k -> v.length }
    val nmid2 = triTypes.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).distinct.length }
    val n1pp = bigrams.distinct.groupBy(_._2).map { case (k, v) => k -> v.length }
    val bTot = bigrams.distinct.length
    docs.filter(_._2.length >= 3).foreach { case (id, w) =>
      val ts = w.lazyZip(w.drop(1)).lazyZip(w.drop(2)).map((a, b, c) => (a, b, c)).toVector
      val (n, nll) = rows(id)
      assert(n == ts.length, s"doc $id trigram count")
      val s = ts.map { t =>
        val ctx = (t._1, t._2)
        val p = (c123(t).toDouble - 0.75) / c12(ctx) +
          ((0.75 * n1ps(ctx)) / c12(ctx)) *
            ((n1p23((t._2, t._3)).toDouble - 0.75) / n1p2dot(t._2) +
             ((0.75 * nmid2(t._2)) / n1p2dot(t._2)) * (n1pp(t._3).toDouble / bTot))
        BigDecimal(-math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val expect = BigDecimal((s * 1000000000).toLong.toDouble / 1000000000 / ts.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(nll == expect, s"doc $id nll")
    }
    // the order actually matters: KN3 must diverge from BOTH the
    // bigram-KN chain and raw MLE (otherwise the extra order is dead)
    val kn2 = run("q_perplexity_kn").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val mle = run("q_perplexity").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.exists { case (id, (_, v)) => kn2.get(id).exists(_ != v) },
      "KN3 == KN2 everywhere")
    assert(rows.exists { case (id, (_, v)) => mle.get(id).exists(_ != v) },
      "KN3 == MLE everywhere")
  }

  test("q_embed_drift: 7 consecutive pairs, cosines bounded, sizes partition the corpus") {
    val rows = run("q_embed_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.map(x => (x._1, x._2)).toSeq ==
      (0L to 6L).map(g => (g, g + 1)))
    rows.foreach { case (_, _, na, nb, c) =>
      assert(na > 0 && nb > 0)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // batch sizes must cover every vector exactly once across batches
    val total = graft.core.Tables.embeddings(spark, sf).count()
    val sizes = (rows.map(x => x._1 -> x._3) ++ rows.map(x => x._2 -> x._4))
      .toMap
    assert(sizes.values.sum == total)
  }

  test("q_coreset: farthest-point invariants — distinct picks, non-increasing radii") {
    val rows = run("q_coreset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1L to 8L))
    assert(rows.map(_._2).distinct.length == 8, "a point selected twice")
    assert(rows.head == ((1L, 0L, 0.0)))
    // the k-center radius can only shrink: each pick's min-distance to
    // the selected set is ≤ the previous pick's (greedy maximality)
    val radii = rows.drop(1).map(_._3)
    assert(radii.forall(_ > 0.0))
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b },
      s"radii not monotone: $radii")
    // cross-check pick 2 against a direct scan: it must be the true
    // farthest point from the seed
    val e = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    def d2(a: Vector[Float], b: Vector[Float]): Double =
      BigDecimal(a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
      }).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val far = e.filter(_._1 != 0L)
      .map { case (id, v) => (d2(v, e(0L)), id) }
      .minBy { case (dd, id) => (-dd, id) }
    assert(rows(1)._2 == far._2 && rows(1)._3 == far._1)
  }

  test("q_fertility: per-language counts reconcile and ratios divide out") {
    val rows = run("q_fertility").collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (docs, words, toks) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(docs > 0 && words > 0 && toks > 0)
      assert(r.getDouble(4) == BigDecimal(toks.toDouble / words)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("q_dedup_incremental: only new-vs-old matches; twins resolve to their originals") {
    val rows = run("q_dedup_incremental").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (newId, matchId, n) =>
      assert(newId >= 100000L, s"old doc $newId reported as new")
      assert(matchId < 100000L, s"new doc $matchId reported as a match target")
      assert(n >= 1)
    }
    // a twin is its original + 2 trailing words — banding should
    // resolve nearly all of them to exactly their source doc
    val exact = rows.count { case (newId, matchId, _) => matchId == newId - 100000L }
    assert(exact >= (rows.length * 9) / 10,
      s"only $exact/${rows.length} twins matched their own original")
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.length >= (total * 9) / 10,
      s"only ${rows.length}/$total twins detected at all")
  }

  test("q_vocab_coverage: monotone budget curve that saturates at full vocab") {
    val rows = run("q_vocab_coverage").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(16L, 64L, 256L, 1024L))
    val (covs, total, types) = (rows.map(_._5), rows.head._3, rows.head._4)
    assert(rows.forall(r => r._3 == total && r._4 == types))
    assert(rows.forall(r => r._2 <= total))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b }, "not monotone")
    rows.filter(_._1 >= types).foreach(r =>
      assert(r._5 == 1.0 && r._2 == total, s"K=${r._1} should cover everything"))
  }

  test("q_modularity: degree accounting closes and terms recompute") {
    val rows = run("q_modularity").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val m = rows.map(_._3).sum / 2 // every edge contributes 2 degree
    assert(rows.map(_._3).sum % 2 == 0)
    assert(rows.map(_._2).sum <= m)
    rows.foreach { case (_, ec, dc, q) =>
      assert(2 * ec <= dc) // intra edges consume 2 degree each
      val expect = BigDecimal(ec.toDouble / m
        - (dc.toDouble / (2 * m)) * (dc.toDouble / (2 * m)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(q == expect)
    }
  }

  test("q_mmr_rerank: greedy invariants — distinct picks, monotone penalized scores") {
    val rows = run("q_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.length == 25)
    rows.groupBy(_._1).foreach { case (probe, sel) =>
      val bySteps = sel.sortBy(_._2)
      assert(bySteps.map(_._2).toSeq == (1L to 5L), s"probe $probe steps")
      // no candidate selected twice
      assert(sel.map(_._3).distinct.length == 5, s"probe $probe dups")
      // round 1 is the pure-similarity argmax: no later pick beats it
      assert(bySteps.head._4 == bySteps.map(_._4).max, s"probe $probe step1")
      assert(bySteps.head._5 == bySteps.head._4, s"probe $probe step1 mmr=simq")
      // from round 2 on the selected set only grows, so the greedy
      // maximum can only fall (penalties are maxima over supersets)
      val tail = bySteps.drop(1).map(_._5)
      assert(tail.zip(tail.drop(1)).forall { case (a, b) => a >= b },
        s"probe $probe mmr not monotone: $tail")
      // and every penalized score sits strictly below its own simq
      bySteps.drop(1).foreach { case (_, _, _, simq, mmr) =>
        assert(mmr < simq)
      }
    }
  }

  test("q_c4_gopher equals a plain-Scala replay of the five-rule gate") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2)))
    case class Agg(var docs: Long = 0, var wc: Long = 0, var mwl: Long = 0,
      var stop: Long = 0, var rep: Long = 0, var ttr: Long = 0,
      var keep: Long = 0)
    val bySrc = scala.collection.mutable.Map.empty[String, Agg]
    docs.foreach { case (src, text) =>
      val ws = text.split(" ", -1).toSeq
      val n = ws.size.toLong
      val chars = text.length.toLong
      val counts = ws.groupBy(identity).map { case (_, o) => o.size.toLong }
      val fWc = n >= 30 && n <= 90
      val body = chars - (n - 1)
      val fMwl = body >= 3 * n && body <= 10 * n
      val fStop = ws.count(w => w == "the" || w == "a") >= 2
      val fRep = counts.max * 8 <= n
      val fTtr = counts.size.toLong * 5 >= n * 2
      val a = bySrc.getOrElseUpdate(src, Agg())
      a.docs += 1
      if (fWc) a.wc += 1; if (fMwl) a.mwl += 1; if (fStop) a.stop += 1
      if (fRep) a.rep += 1; if (fTtr) a.ttr += 1
      if (fWc && fMwl && fStop && fRep && fTtr) a.keep += 1
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = run("q_c4_gopher").collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getDouble(8))).toMap
    assert(got.keySet == bySrc.keySet.toSet)
    got.foreach { case (src, (nd, wc, mwl, st, rep, ttr, keep, rate)) =>
      val a = bySrc(src)
      assert((nd, wc, mwl, st, rep, ttr, keep) ==
        ((a.docs, a.wc, a.mwl, a.stop, a.rep, a.ttr, a.keep)), s"source $src")
      assert(rate == r6(a.keep.toDouble / a.docs), s"rate $src")
      // the AND gate can never pass more docs than its strictest rule
      assert(keep <= Seq(wc, mwl, st, rep, ttr).min, s"gate law $src")
    }
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }
}
