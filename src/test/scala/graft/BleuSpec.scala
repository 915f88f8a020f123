package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Brute-force recomputation gate for q_bleu: per-source clipped
  * modified n-gram precision (n = 1, 2) and the brevity length ratio,
  * replayed in plain Scala over the collected sf0.001 corpus with the
  * same next-doc_id-in-source reference pairing. Also pins the metric
  * laws the hash compare can't express: p_n ≤ 1, clipped ≤ total, and
  * p_2 ≤ p_1 never being violated is NOT a law (bigram precision can
  * exceed unigram on adversarial pairs) — so no such assertion.
  */
class BleuSpec extends AnyFunSuite {

  private def tokens(text: String): Seq[String] =
    "[a-z]+".r.findAllIn(text.toLowerCase).toSeq

  test("q_bleu equals a plain-Scala replay of clipped n-gram precision") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, _, t) => id -> tokens(t) }.toMap
    def grams(ws: Seq[String], n: Int): Map[String, Long] =
      ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val pairs = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ids = ds.map(_._1).sorted
      ids.zip(ids.drop(1)).map { case (c, r) => (src, c, r) }
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (for {
      n <- Seq(1, 2)
      (src, ps) <- pairs.groupBy(_._1)
    } yield {
      var clip = 0L; var tot = 0L
      ps.foreach { case (_, c, r) =>
        val cg = grams(toks(c), n); val rg = grams(toks(r), n)
        cg.foreach { case (g, cnt) =>
          clip += math.min(cnt, rg.getOrElse(g, 0L)); tot += cnt
        }
      }
      val candT = ps.map(p => toks(p._2).size.toLong).sum
      val refT = ps.map(p => toks(p._3).size.toLong).sum
      (src, n.toLong) ->
        (clip, tot, r6(clip.toDouble / tot), candT, refT,
          r6(candT.toDouble / refT))
    }).toMap
    val got = SparkEntry.queries("q_bleu")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5),
          r.getLong(6), r.getDouble(7))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"cell $k") }
    got.foreach { case ((src, n), (clip, tot, pn, _, _, _)) =>
      assert(clip <= tot, s"$src n=$n clipped exceeds total")
      assert(pn >= 0.0 && pn <= 1.0, s"$src n=$n precision out of range")
    }
  }

  test("q_rouge_n equals a plain-Scala replay of clipped n-gram recall") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.map { case (id, _, t) => id -> tokens(t) }.toMap
    def grams(ws: Seq[String], n: Int): Map[String, Long] =
      ws.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val pairs = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ids = ds.map(_._1).sorted
      ids.zip(ids.drop(1)).map { case (c, r) => (src, c, r) }
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (for {
      n <- Seq(1, 2)
      (src, ps) <- pairs.groupBy(_._1)
    } yield {
      var clip = 0L; var refTot = 0L; var candTot = 0L
      ps.foreach { case (_, c, r) =>
        val cg = grams(toks(c), n); val rg = grams(toks(r), n)
        rg.foreach { case (g, cnt) =>
          clip += math.min(cg.getOrElse(g, 0L), cnt); refTot += cnt
        }
        candTot += cg.values.sum
      }
      (src, n.toLong) -> (clip, refTot, candTot,
        r6(clip.toDouble / refTot), r6(clip.toDouble / candTot),
        r6(2.0 * clip / (candTot + refTot)))
    }).toMap
    val got = SparkEntry.queries("q_rouge_n")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"cell $k") }
    // the BLEU↔ROUGE consistency law: on the SAME pairing, the clipped
    // intersection is symmetric — q_bleu's clip_cnt equals q_rouge_n's
    // (min(cand, ref) summed over the same gram multiset)
    val bleuClip = SparkEntry.queries("q_bleu")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case (k, (clip, _, _, _, _, _)) =>
      assert(clip == bleuClip(k), s"clip asymmetry at $k")
    }
  }

  test("q_chrf equals a plain-Scala replay of char-3-gram clipped overlap") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).toLowerCase))
    def grams(c: String): Map[String, Long] =
      (if (c.length < 3) Seq.empty[String]
       else (0 to c.length - 3).map(i => c.substring(i, i + 3)))
        .groupBy(identity).map { case (g, o) => g -> o.size.toLong }
    val byId = docs.map(d => d._1 -> d._3).toMap
    val pairs = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ids = ds.map(_._1).sorted
      ids.zip(ids.drop(1)).map { case (c, r) => (src, c, r) }
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = pairs.groupBy(_._1).map { case (src, ps) =>
      var clip = 0L; var cand = 0L; var ref = 0L
      ps.foreach { case (_, c, r) =>
        val cg = grams(byId(c)); val rg = grams(byId(r))
        cg.foreach { case (g, n) =>
          clip += math.min(n, rg.getOrElse(g, 0L)); cand += n
        }
        ref += rg.values.sum
      }
      src -> (clip, cand, ref, r6(clip.toDouble / cand),
        r6(clip.toDouble / ref), r6(5.0 * clip / (4L * ref + cand)))
    }
    val got = SparkEntry.queries("q_chrf")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"source $k") }
    // chrF2 is a weighted harmonic mean: it sits between P and R
    got.foreach { case (k, (_, _, _, p, r, f)) =>
      assert(f >= math.min(p, r) - 1e-6 && f <= math.max(p, r) + 1e-6,
        s"$k: chrF2 $f outside [$p, $r]")
    }
  }
}
