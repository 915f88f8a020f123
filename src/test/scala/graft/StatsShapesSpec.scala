package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.{sf, spark}

/** Semantic recomputation gates for the round-6 stats / event-flow /
  * corpus / graph operators: each declared query's answer is
  * recomputed in plain Scala from collected base rows at sf0.001
  * (small enough to brute-force) and compared row-for-row. These
  * catch algorithmic regressions the oracle hash-compare would also
  * catch, but locally and with a readable diff — plus they pin the
  * properties the clever implementations must preserve (orientation
  * losslessness, bucketed-prefix-max equivalence, window-state
  * pattern semantics).
  */
class StatsShapesSpec extends AnyFunSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_skyline equals the brute-force dominance frontier") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400000000L, r.getDouble(2)))
    val frontier = orders.filter { case (_, d, p) =>
      !orders.exists { case (_, d2, p2) => d2 > d && p2 > p }
    }.map(_._1).sorted
    val got = q("q_skyline").select("o_orderkey").collect()
      .map(_.getLong(0)).sorted
    assert(got.toSeq == frontier.toSeq)
  }

  test("q_triangles equals the brute-force canonical triple count") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    val edges = byOrder.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nTri = edges.iterator.map { case (a, b) =>
      (adj.getOrElse(a, Set.empty[Long]) intersect
        adj.getOrElse(b, Set.empty[Long])).size.toLong
    }.sum
    val row = q("q_triangles").collect().head
    assert(row.getLong(0) == edges.size.toLong, "edge count")
    assert(row.getLong(1) == nTri, "triangle count")
  }

  test("q_seq_pattern equals a per-user sequential scan") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expect = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      var lastClick = Option.empty[Long]
      var lastView = Option.empty[Long]
      var nP = 0L; var nM = 0L
      sorted.foreach { case (_, _, typ, us) =>
        if (typ == "purchase") {
          nP += 1
          val ok = lastClick.exists(c => us - c <= 3600000000L &&
            lastView.exists(_ > c))
          if (ok) nM += 1
        }
        if (typ == "click") lastClick = Some(us)
        if (typ == "view") lastView = Some(us)
      }
      u -> ((nP, nM))
    }.filter(_._2._1 > 0)
    val got = q("q_seq_pattern").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }

  test("q_attribution credits every purchase exactly once") {
    val out = q("q_attribution").collect()
    val totalCredited = out.map(_.getLong(1)).sum
    val nPurchases = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(totalCredited == nPurchases)
    val types = out.map(_.getString(0)).toSet
    assert(types.subsetOf(Set("click", "view", "signup", "(none)")))
  }

  test("q_winsorize clips ~5% each side and bounds the mean") {
    q("q_winsorize").collect().foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // exact interpolated p05/p95 ⇒ strictly-below/above counts are
      // ≤ 5% of n (ties at the bound are not clipped)
      assert(lo <= n * 5 / 100 + 1, s"lo=$lo n=$n")
      assert(hi <= n * 5 / 100 + 1, s"hi=$hi n=$n")
      assert(r.getDouble(4) > 0)
    }
  }

  test("q_keywords: top-3 per doc compiles to a per-key group limit") {
    // rn <= 3 over the doc_id window must run as WindowGroupLimit
    // (partial limit before the exchange), not a full per-doc sort
    val plan = q("q_keywords").queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("q_join_interval: exactly one version matches each covered purchase") {
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val signupsByUser = ev.filter(_._3 == "signup").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._4).sorted }
    val expected = ev.filter(_._3 == "purchase").flatMap { case (u, eid, _, us) =>
      signupsByUser.get(u).flatMap { ss =>
        val before = ss.filter(_ <= us)
        if (before.isEmpty) None else Some((eid, before.max))
      }
    }.toMap
    val got = q("q_join_interval").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected)
  }

  test("q_pareto_share: minimal prefix covering 80% per nation") {
    val rows = q("q_pareto_share").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val rev = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))")).as("t"))
      .collect().map(r => r.getInt(0).toLong -> r.getDecimal(1).doubleValue()).toMap
    rows.groupBy(_._1).foreach { case (nat, rs) =>
      val total = rev(nat)
      val selected = rs.map(_._4).sum
      val withoutLast = selected - rs.maxBy(_._3)._4
      assert(selected >= 0.8 * total - 1e-6, s"nation $nat undercovers")
      assert(withoutLast < 0.8 * total + 1e-6, s"nation $nat not minimal")
    }
  }

  test("q_itemsets: top-100 compiles to TakeOrderedAndProject") {
    val plan = q("q_itemsets").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q_profile: all six columns in one aggregation pass") {
    // the multi-distinct profile must stay a single scan (Expand),
    // not one scan per column
    val plan = q("q_profile").queryExecution.optimizedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Relation"))
    assert(scans == 1, s"expected 1 scan, plan:\n$plan")
  }
}
