package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic gates for the round-12 wave-2 operators: isotonic
  * calibration (q_isotonic), stratified propensity ATT
  * (q_propensity), source-sampled betweenness (q_betweenness) and
  * the watermark lateness audit (q_watermark_audit).
  */
class Round12ShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_isotonic fit is non-decreasing and bounded by the raw rates") {
    val rows = q("q_isotonic").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    iso.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b + 1e-12, s"isotonic fit decreases: $a -> $b")
    }
    val raw = rows.map(_.getAs[Double]("raw_rate"))
    // the PAV fit cannot leave the raw-rate envelope
    assert(iso.min >= raw.min - 1e-9 && iso.max <= raw.max + 1e-9)
  }

  test("q_isotonic equals a driver-side PAV over the same bins") {
    val rows = q("q_isotonic").collect().sortBy(_.getLong(0))
    val g = rows.map(_.getAs[Long]("g").toDouble)
    val n = rows.map(_.getAs[Long]("n").toDouble)
    // classic sequential pool-adjacent-violators on (g/n, weight n)
    case class Block(var gs: Double, var ns: Double)
    val st = scala.collection.mutable.Stack[Block]()
    for (i <- g.indices) {
      st.push(Block(g(i), n(i)))
      while (st.size > 1 && {
        val top = st(0); val below = st(1)
        below.gs / below.ns > top.gs / top.ns
      }) {
        val top = st.pop(); st.head.gs += top.gs; st.head.ns += top.ns
      }
    }
    // expand blocks to per-bin values by weight: rebuild via block sizes
    val perBin = {
      val out = Array.newBuilder[Double]
      var i = 0
      val blocks = st.toSeq.reverse
      for (b <- blocks) {
        var mass = b.ns
        while (mass > 1e-9 && i < n.length) {
          out += b.gs / b.ns; mass -= n(i); i += 1
        }
      }
      out.result()
    }
    assert(perBin.length == rows.length)
    rows.indices.foreach { i =>
      val got = rows(i).getAs[Double]("iso_rate")
      assert(math.abs(got - perBin(i)) < 1e-5,
        s"bin ${rows(i).getLong(0)}: minimax $got vs PAV ${perBin(i)}")
    }
  }

  test("q_propensity ATT equals the treated-weighted stratum diffs") {
    val rows = q("q_propensity").collect().sortBy(_.getLong(0))
    assert(rows.length >= 2, "needs multiple strata")
    val nt = rows.map(_.getAs[Long]("n_t"))
    val valid = rows.filter(r => !r.isNullAt(r.fieldIndex("diff")))
    val ntTot = nt.sum.toDouble
    val att = valid.map { r =>
      BigDecimal(r.getAs[Double]("diff") * r.getAs[Long]("n_t") / ntTot)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val got = rows.head.getAs[Double]("att")
    assert(math.abs(got - att) < 1e-5, s"att $got vs replay $att")
    // both arms populated somewhere (the estimate is meaningful)
    assert(rows.map(_.getAs[Long]("n_c")).sum > 0)
  }

  test("q_betweenness is deterministic under input repartitioning and non-negative") {
    val a = q("q_betweenness").collect()
    val b = q("q_betweenness").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 20)
    a.foreach(r => assert(r.getAs[Double]("bc") >= 0.0))
    // the 4 source suppliers do accumulate dependency as brokers, but
    // the top set must not be ONLY sources — customers sit on paths too
    assert(a.map(_.getLong(0)).exists(_ > 100000L), "suppliers present")
  }

  test("q_watermark_audit equals a driver-side arrival replay") {
    val rows = q("q_watermark_audit").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_late"),
          r.getAs[Long]("max_late_s"))).toMap
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val replay = ev.groupBy(_._1).map { case (u, es) =>
      val byArrival = es.map { case (_, id, eus) =>
        (eus + ((id * 2654435761L) % 997) * 1000000L, id, eus)
      }.sortBy(t => (t._1, t._2))
      var hwm = Long.MinValue
      var nLate = 0L
      var maxLate = 0L
      byArrival.foreach { case (_, _, eus) =>
        if (hwm != Long.MinValue && eus < hwm - 600000000L) {
          nLate += 1
          maxLate = math.max(maxLate, (hwm - 600000000L - eus) / 1000000L)
        }
        hwm = math.max(hwm, eus)
      }
      u -> ((es.length.toLong, nLate, maxLate))
    }
    assert(rows.keySet == replay.keySet)
    replay.foreach { case (u, exp) =>
      assert(rows(u) == exp, s"user $u: ${rows(u)} vs replay $exp")
    }
    rows.values.foreach { case (n, nl, ml) =>
      assert(nl <= n)
      // 996 s jitter - 600 s watermark bounds worst lateness
      assert(ml <= 396L)
    }
  }

  test("q_ar1 phi is stationary-plausible and the forecast follows the chain") {
    val rows = q("q_ar1").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val phi = r.getAs[Double]("phi"); val c = r.getAs[Double]("c")
      // a value-total series is mean-reverting noise, not a random walk
      assert(math.abs(phi) < 1.0, s"non-stationary phi $phi")
      // forecast must lie between c (x_n = 0) and c + phi*x for some
      // positive x: just pin the shared-chain identity loosely via
      // forecast ~ c + phi * x_n => (forecast - c) / phi is a
      // plausible daily total when phi != 0
      if (math.abs(phi) > 1e-9) {
        val xn = (r.getAs[Double]("forecast") - c) / phi
        assert(xn > 0.0, s"implied last observation $xn must be positive")
      }
    }
  }

  test("q_lift gain is non-increasing down the bins and lift*share == gain") {
    val rows = q("q_lift").collect().sortBy(-_.getLong(0))
    assert(rows.nonEmpty)
    // scanning MORE bins (lower thresholds) can only capture more
    val gains = rows.map(_.getAs[Double]("gain"))
    gains.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi <= lo + 1e-9, "gain must grow as bins accumulate")
    }
    assert(math.abs(gains.last - 1.0) < 1e-9, "full scan captures all positives")
    val totalN = rows.map(_.getAs[Long]("n")).sum
    val totalP = rows.map(_.getAs[Long]("pos")).sum
    rows.foreach { r =>
      val expect = r.getAs[Long]("cum_pos").toDouble * totalN /
        (r.getAs[Long]("cum_n") * totalP)
      assert(math.abs(r.getAs[Double]("lift") - expect) < 1e-5)
    }
  }

  test("q_negative_sampling emits only true negatives, <= 3 per probe user") {
    val rows = q("q_negative_sampling").collect()
    assert(rows.nonEmpty)
    val inter = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val u = r.getAs[Long]("u"); val item = r.getAs[Long]("item")
      assert(!inter.contains((u, item)),
        s"sampled ($u, $item) is a real interaction")
      assert(u % 97 == 0, "only probe users")
    }
    rows.groupBy(_.getAs[Long]("u")).foreach { case (u, rs) =>
      assert(rs.length <= 3, s"user $u got ${rs.length} negatives")
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rs.length).toSeq)
    }
  }
}
