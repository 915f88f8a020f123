package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the event-sequence (SessionQueries) and corpus-
  * ranking (RankingQueries) inventories: expectations recomputed
  * independently in plain Scala over the collected sf0.001 tables, so a
  * query and its oracle can't be wrong together; plus the plan shape
  * the stratified-sample scale claim rests on (WindowGroupLimit).
  */
class SessionRankingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(key: String) = SparkEntry.queries(key)(spark, sf)

  // (user_id, event_id, us) ordered the way every sequence query orders
  private lazy val eventSeq: Map[Long, Seq[(Long, Long)]] =
    graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.map(r => (r._3, r._2)).sorted.toSeq // (us, event_id)
      }

  test("q_sessionize: sessions match a direct fold over ordered events") {
    val expected = eventSeq.flatMap { case (u, evs) =>
      val sessions = evs.tail.foldLeft(List(List(evs.head))) {
        case (acc @ cur :: rest, e) =>
          if (e._1 - cur.head._1 > 1800000000L) List(e) :: acc
          else (e :: cur) :: rest
        case (Nil, e) => List(List(e))
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (u, i + 1L) -> (s.size.toLong, s.head._1, s.last._1)
      }
    }
    val got = run("q_sessionize").collect().map { r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))
    }.toMap
    assert(got == expected)
  }

  test("q_sessionize: a gap of exactly 30 minutes does NOT split (strict >)") {
    // contract pin: the break predicate is `gap > 1800000000`, so equal
    // gaps stay in-session — verified against the fold above, which
    // encodes the same strict inequality; here we assert the query's
    // total session count is what the fold says, not a ±1 variant
    val expected = eventSeq.values.map { evs =>
      1 + evs.sliding(2).count {
        case Seq(a, b) => b._1 - a._1 > 1800000000L
        case _         => false
      }
    }.sum
    assert(run("q_sessionize").select(col("user_id"), col("session_seq"))
      .distinct().count() == expected)
  }

  test("q_markov: probabilities row-normalize to 1 and counts cover all transitions") {
    val rows = run("q_markov").collect()
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-4, s"$from probs sum to $p")
    }
    val nTransitions = rows.map(_.getLong(2)).sum
    val expected = eventSeq.values.map(e => (e.size - 1).toLong).sum
    assert(nTransitions == expected)
  }

  test("q_moving_avg: trailing 1h mean matches a direct recompute for the busiest user") {
    val values = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val user = eventSeq.maxBy(_._2.size)._1
    val evs = eventSeq(user) // (us, event_id) sorted
    val got = run("q_moving_avg").filter(col("user_id") === user)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    evs.foreach { case (us, id) =>
      // RANGE frame: every event of this user within [us-1h, us] — peers
      // at the same µs included regardless of event_id order
      val frame = evs.filter(e => e._1 >= us - 3600000000L && e._1 <= us)
      val mean = BigDecimal(frame.map(e => BigDecimal(values(e._2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / frame.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(id) - mean) < 1e-6, s"event $id: ${got(id)} vs $mean")
    }
  }

  test("q_zscore: flagged rows are exactly the |z| > 2.5 set") {
    val evs = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = evs.groupBy(_._2)
    val expected = evs.filter { case (_, t, v) =>
      val g = byType(t).map(e => BigDecimal(e._3).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      val n = g.size
      val sx = g.sum.toDouble; val sxx = g.map(x => x * x).sum.toDouble
      val z = (v - sx / n) / math.sqrt(sxx / n - (sx / n) * (sx / n))
      math.abs(z) > 2.5
    }.map(_._1).toSet
    assert(run("q_zscore").collect().map(_.getLong(0)).toSet == expected)
  }

  test("q_minmax_norm: extremes map to 0 and 1 per type") {
    val rows = run("q_minmax_norm").collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val norms = rs.map(_._2)
      assert(norms.min == 0.0 && norms.max == 1.0, s"$t: [${norms.min}, ${norms.max}]")
      assert(norms.forall(n => n >= 0.0 && n <= 1.0))
    }
  }

  private lazy val docTokens: Map[Long, Seq[String]] =
    graft.core.Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq)
      .toMap

  test("q_tfidf: per-doc top-5 matches a direct rational-idf recompute") {
    val n = docTokens.size
    val df = docTokens.values.flatMap(_.distinct).groupBy(identity).map { case (t, o) => t -> o.size }
    val got = run("q_tfidf").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 5))
    // exact top-5 term set for a handful of docs
    docTokens.keys.toSeq.sorted.take(10).foreach { id =>
      val tf = docTokens(id).groupBy(identity).map { case (t, o) => t -> o.size }
      val top = tf.toSeq
        .map { case (t, f) => (t, f, f * ((n + 1.0) / (df(t) + 1.0))) }
        .sortBy { case (t, _, s) => (-s, t) }.take(5)
      assert(byDoc(id).map(r => (r._2, r._3)).toSet ==
        top.map { case (t, f, _) => (t, f.toLong) }.toSet, s"doc $id")
    }
  }

  test("q_vocab_prune: kept + dropped covers every token occurrence") {
    val totals = docTokens.map { case (id, ts) => id -> ts.size.toLong }
    run("q_vocab_prune").collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == totals(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("q_bm25: scores strictly ordered, and term-bearing docs only") {
    val rows = run("q_bm25").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.length == 20)
    assert(rows.forall(_._2 > 0))
    val qterms = Set("spark", "vector", "stream")
    rows.foreach { case (id, _) =>
      assert(docTokens(id).exists(qterms), s"doc $id has no query term")
    }
  }

  test("q_ngram_freq: top bigram matches a direct recompute") {
    val counts = docTokens.values.toSeq
      .flatMap(ts => if (ts.size < 2) Nil else ts.sliding(2).map(_.mkString(" ")).toSeq)
      .groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    val got = run("q_ngram_freq").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._2).sameElements(got.map(_._2).sortBy(-_)), "not count-descending")
    val best = counts.toSeq.sortBy { case (b, c) => (-c, b) }.head
    assert(got.head == best)
    got.foreach { case (b, c) => assert(counts(b) == c, b) }
  }

  test("q_sample_stratified: exactly min(n, 50) per stratum, stable across runs") {
    val perLang = graft.core.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q_sample_stratified").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sizes = got.groupBy(_._1).map { case (l, rs) => l -> rs.length.toLong }
    assert(sizes == perLang.map { case (l, n) => l -> math.min(n, 50L) })
    // pure function of the key: a second run returns the identical sample
    assert(run("q_sample_stratified").collect().map(r => (r.getString(0), r.getLong(1)))
      .sameElements(got))
  }

  test("q_sample_stratified: rank filter compiles to WindowGroupLimit (partial top-k)") {
    // the scale claim: each task keeps ≤50 rows per stratum BEFORE the
    // exchange, so a low-cardinality stratum column can't funnel the
    // full table through one window task
    val s = run("q_sample_stratified").queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit"), s.take(3000))
  }

  test("q_pack_sequences: packs match a sequential fold over doc_id order") {
    val ordered = docTokens.toSeq.sortBy(_._1)
      .map { case (id, ts) => (id, ts.size.toLong) }
    var cum = 0L
    val assigned = ordered.map { case (id, nt) =>
      val p = cum / 512; cum += nt; (p, id, nt)
    }
    val expected = assigned.groupBy(_._1).map { case (p, rs) =>
      p -> (rs.size.toLong, rs.map(_._3).sum, rs.map(_._2).min, rs.map(_._2).max)
    }
    val got = run("q_pack_sequences").collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("q_pack_sequences: token conservation and disjoint id ranges") {
    val rows = run("q_pack_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // every token lands in exactly one pack
    assert(rows.map(_._3).sum == docTokens.values.map(_.size.toLong).sum)
    assert(rows.map(_._2).sum == docTokens.size.toLong)
    // doc_id ranges partition the corpus in order (packing never reorders)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4, s"overlapping packs $a $b")
      case _           =>
    }
  }

  /** Plain-Scala twin of the q_bm25 scoring chain, written with the same
    * operation shapes so the doubles agree; UNROUNDED (the ranking
    * grid — rankings order by the raw score per the object rule).
    */
  private lazy val bm25Raw: Seq[(Long, Double)] = {
    val terms = Seq("spark", "vector", "stream")
    val nDocs = docTokens.size.toLong
    val sumDl = docTokens.values.map(_.size.toLong).sum
    val avgdl = sumDl.toDouble / nDocs
    val tf: Map[(Long, String), Long] = docTokens.toSeq.flatMap { case (id, ts) =>
      ts.filter(terms.contains).groupBy(identity).map { case (t, o) => (id, t) -> o.size.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.toSeq.map(_._2).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    tf.keys.map(_._1).toSeq.distinct.map { id =>
      val dl = docTokens(id).size.toLong
      val score = terms.map { t =>
        tf.get((id, t)).fold(0.0) { f =>
          ((nDocs - df(t) + 0.5) / (df(t) + 0.5)) *
            ((f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
        }
      }.sum
      id -> score
    }
  }

  test("q_rank_fusion: both arms and the fused order match a plain-Scala recompute") {
    val lexRank: Map[Long, Long] = bm25Raw
      .sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val pe = embs.find(_._1 == 0L).get._2
    def fold(xs: Array[Double]): Double = xs.foldLeft(0.0)(_ + _)
    val pn = math.sqrt(fold(pe.map(x => x * x)))
    val semRank: Map[Long, Long] = embs.toSeq.map { case (id, e) =>
      val cos = fold(e.zip(pe).map { case (x, y) => x * y }) /
        (math.sqrt(fold(e.map(x => x * x))) * pn)
      id -> cos
    }.sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val expected = (lexRank.keySet ++ semRank.keySet).toSeq.map { id =>
      val raw = lexRank.get(id).fold(0.0)(r => 1.0 / (60 + r)) +
        semRank.get(id).fold(0.0)(r => 1.0 / (60 + r))
      (id, lexRank.get(id), semRank.get(id),
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, raw)
    }.sortBy { case (id, _, _, _, raw) => (-raw, id) }
      .map { case (id, rl, rs, rrf, _) => (id, rl, rs, rrf) }
    val got = run("q_rank_fusion").collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3))
    }.toSeq
    assert(got == expected)
  }

  test("q_rank_fusion: lexical arm reproduces q_bm25's top-20 order") {
    // the shared-chain guarantee, end to end: rank r in the fusion's
    // lexical arm = position r in q_bm25's output (both rank on the
    // UNROUNDED score with doc_id tie-break)
    val bm = run("q_bm25").collect().map(_.getLong(0)).toSeq
    val byRank = run("q_rank_fusion").collect()
      .filterNot(_.isNullAt(1)).map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(_._1).map(_._2).toSeq
    assert(byRank == bm)
  }

  test("q_rank_fusion: each arm's ranks are a permutation of 1..20") {
    val rows = run("q_rank_fusion").collect()
    def ranks(i: Int) = rows.filterNot(_.isNullAt(i)).map(_.getLong(i)).sorted.toSeq
    assert(ranks(1) == (1L to 20L), "lexical arm")
    assert(ranks(2) == (1L to 20L), "semantic arm")
  }

  test("q_rank_fusion: arms are TakeOrderedAndProject over cached slices") {
    // each arm's top-20 must be partial-per-partition top-k (never a
    // global sort), and the rank self-joins must read the 20-row cache
    // instead of recomputing the scoring chains
    val df = run("q_rank_fusion")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert("TakeOrderedAndProject".r.findAllIn(s).size >= 2, s.take(3000))
    assert(s.contains("InMemoryTableScan"), "top-k slices not cached")
  }

  test("q_pack_sequences: bucket totals reuse the tokenize exchange") {
    // the scale claim: the corpus is tokenized and shuffled ONCE — the
    // bucket-total branch must read a ReusedExchange of the window's
    // bucket exchange, not re-scan documents (AQE finalizes reuse at
    // execution, so run the query first)
    val df = run("q_pack_sequences")
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("ReusedExchange"), s.take(3000))
  }
}
