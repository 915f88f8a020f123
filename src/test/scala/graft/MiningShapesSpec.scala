package graft

import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation + plan gates for the round-6 mining batch
  * (q_entropy / q_benford / q_cohort_matrix / q_copurchase /
  * q_xentropy / q_seasonality / q_abtest / q_kmeans / q_survival /
  * q_tpch_q4): each answer is recomputed in plain Scala from collected
  * base rows at sf0.001 and compared exactly (counts) or to 1e-9
  * (float statistics), and the scale-critical plan shapes (semi join
  * for EXISTS, broadcast centroids / set sizes) are pinned.
  */
class MiningShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("q_kmeans equals the brute-force Lloyd assignment") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = vecs.filter(_._1 < 8).sortBy(_._1)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val assigned = vecs.map { case (_, v) =>
      cents.map { case (cid, cv) => (d2(v, cv), cid) }.min._2
    }
    val want = assigned.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = q("q_kmeans").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q_entropy equals a direct per-cohort entropy computation") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0) % 8, r.getString(1)))
    val want = ev.groupBy(_._1).map { case (cohort, rows) =>
      val n = rows.length.toDouble
      val h = rows.groupBy(_._2).values.map { g =>
        val p = g.length / n
        -p * (math.log(p) / math.log(2))
      }.sum
      cohort -> (rows.length.toLong, h)
    }
    val got = q("q_entropy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    for ((c, (n, h)) <- want) {
      assert(got(c)._1 == n, s"cohort $c count")
      assert(math.abs(got(c)._2 - h) < 1e-6, s"cohort $c entropy")
    }
  }

  test("q_survival equals the cumulative lifetime distribution") {
    val ym = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect()
      .map { r =>
        val t = Instant.ofEpochSecond(r.getLong(1) / 1000000L)
          .atOffset(ZoneOffset.UTC)
        (r.getLong(0), t.getYear * 12 + t.getMonthValue)
      }
    val life = ym.groupBy(_._1).map { case (_, rows) =>
      rows.map(_._2).max - rows.map(_._2).min
    }.toSeq
    val want = life.distinct.sorted.map { m =>
      m.toLong -> life.count(_ >= m).toLong
    }.toMap
    val got = q("q_survival").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q_copurchase equals brute-force set Jaccard") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ordCust = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val custNat = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
      .toMap
    val natName = spark.read.parquet(s"$sf/nation.parquet")
      .select("n_nationkey", "n_name").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1))).toMap
    val sets = li.map { case (ok, pk) =>
      (natName(custNat(ordCust(ok))), pk)
    }.distinct.groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSet }
    val nats = sets.keys.toSeq.sorted
    val want = (for {
      i <- nats.indices; j <- (i + 1) until nats.length
      a = sets(nats(i)); b = sets(nats(j))
      inter = (a intersect b).size if inter > 0
    } yield (nats(i), nats(j)) ->
        (inter.toLong, inter.toDouble / (a.size + b.size - inter))).toMap
    val got = q("q_copurchase").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    for ((k, (i, jac)) <- want) {
      assert(got(k)._1 == i, s"pair $k intersection")
      assert(math.abs(got(k)._2 - jac) < 1e-6, s"pair $k jaccard")
    }
  }

  test("q_tpch_q4 equals a per-order late-line existence scan") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val shipByOrder = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val lo = Instant.parse("1996-01-01T00:00:00Z").getEpochSecond * 1000000L
    val hi = Instant.parse("1997-01-01T00:00:00Z").getEpochSecond * 1000000L
    val sixtyDays = 60L * 86400L * 1000000L
    val want = orders.filter { case (ok, us, _) =>
      us >= lo && us < hi &&
        shipByOrder.getOrElse(ok, Seq.empty[Long]).exists(_ > us + sixtyDays)
    }.groupBy(_._3).map { case (p, v) => p -> v.length.toLong }
    val got = q("q_tpch_q4").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q_benford digit counts match a formatted-string recomputation") {
    val prices = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val want = prices.filter(_ >= 1)
      .map(p => BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toString.charAt(0).asDigit.toLong)
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val got = q("q_benford").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q_tpch_q4 plan: EXISTS compiles to a semi join, date filter pushed") {
    val s = plan("q_tpch_q4")
    assert(s.contains("LeftSemi"), s.take(3000))
    val f = q("q_tpch_q4").queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(f.contains("GreaterThanOrEqual(o_orderdate"),
      "orders date range not pushed to scan:\n" + f.takeRight(2000))
  }

  test("q_kmeans plan: centroids ride a broadcast, not a shuffle") {
    val s = plan("q_kmeans")
    assert(s.contains("BroadcastNestedLoopJoin") ||
      s.contains("BroadcastHashJoin"), s.take(3000))
  }

  test("q_dbscan equals brute-force O(n^2) DBSCAN with union-find clusters") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1)(0).toDouble, r.getSeq[Float](1)(1).toDouble))
      .sortBy(_._1)
    val eps2 = 0.001024
    def near(a: (Long, Double, Double), b: (Long, Double, Double)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps2
    val nbrs = pts.map(p => p._1 -> pts.filter(q => near(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).length >= 5).toSet
    // union-find over core-core eps-edges; root = min id of the component
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    for (a <- core; b <- nbrs(a) if b != a && core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    val want = pts.map { case (id, _, _) =>
      if (core(id)) id -> ("core", find(id))
      else {
        val coreN = nbrs(id).filter(n => n != id && core(n))
        if (coreN.nonEmpty) id -> ("border", coreN.map(find).min)
        else id -> ("noise", -1L)
      }
    }.toMap
    val got = q("q_dbscan").collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
    assert(got == want)
  }

  test("q_dsir matches a brute-force hashed-unigram importance ranking") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Long = {
      val hex = md.digest(w.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 256
    }
    val tokenized = docs.map { case (id, src, text) =>
      (id, src, "[a-z]+".r.findAllIn(text.toLowerCase).map(bucket).toArray)
    }
    val raw = new Array[Long](256); val tgt = new Array[Long](256)
    tokenized.foreach { case (_, src, bs) =>
      bs.foreach { b => raw(b.toInt) += 1; if (src == "src1") tgt(b.toInt) += 1 }
    }
    val (rtot, ttot) = (raw.sum, tgt.sum)
    val lw = (0 until 256).map { b =>
      val x = (tgt(b) + 1.0) / (ttot + 256).toDouble /
        ((raw(b) + 1.0) / (rtot + 256).toDouble)
      b.toLong -> new JBD(math.log(x)).setScale(9, RoundingMode.HALF_UP)
    }.toMap
    val wantTop = tokenized
      .filter(_._3.nonEmpty)
      .map { case (id, src, bs) =>
        val s = bs.foldLeft(JBD.ZERO)((acc, b) => acc.add(lw(b)))
        (id, src, bs.length.toLong,
          s.movePointRight(9).setScale(0, RoundingMode.DOWN).longValue)
      }
      .sortBy { case (id, _, _, siw) => (-siw, id) }.take(100)
    val got = q("q_dsir").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == wantTop.length)
    got.zip(wantTop).foreach { case ((gi, gs, gn, gw), (wi, ws, wn, wsiw)) =>
      assert(gi == wi && gs == ws && gn == wn, s"row: got ($gi,$gs,$gn) want ($wi,$ws,$wn)")
      assert(math.abs(gw - wsiw / 1e9) < 1e-8, s"doc $gi log_iw $gw vs ${wsiw / 1e9}")
    }
  }

  test("q_dsir plan: top-100 cut is a per-partition TakeOrderedAndProject") {
    val s = plan("q_dsir")
    assert(s.contains("TakeOrderedAndProject"), s.take(3000))
  }

  test("q_ucb equals a direct UCB1 computation and picks the argmax arm") {
    val ev = graft.core.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byArm = ev.groupBy(_._1).map { case (a, rows) =>
      a -> (rows.length.toLong, rows.count(_._2 >= 100).toLong)
    }
    val np = ev.length.toDouble
    val want = byArm.map { case (a, (pulls, wins)) =>
      a -> (pulls, wins,
        wins.toDouble / pulls + math.sqrt(2 * math.log(np) / pulls))
    }
    val rows = q("q_ucb").collect()
    val got = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(4), r.getBoolean(5))).toMap
    assert(got.keySet == want.keySet)
    for ((a, (pulls, wins, ucb)) <- want) {
      assert(got(a)._1 == pulls, s"$a pulls")
      assert(got(a)._2 == wins, s"$a wins")
      assert(math.abs(got(a)._3 - ucb) < 1e-9, s"$a ucb")
    }
    val bestArm = want.toSeq.minBy { case (a, (_, _, u)) => (-u, a) }._1
    assert(got(bestArm)._4, "argmax arm not chosen")
    assert(got.count(_._2._4) == 1, "exactly one chosen arm")
  }
}
