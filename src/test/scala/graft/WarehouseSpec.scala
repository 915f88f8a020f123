package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan gates for WarehouseQueries: SCD2 version algebra,
  * data-mix fractions, salted-join equivalence to the plain join, and
  * the quantile-bucket equi-depth property.
  */
class WarehouseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(key: String) = SparkEntry.queries(key)(spark, sf)

  test("q_scd2_merge: updated keys have exactly versions {1 closed, 2 current}, others {1 current}") {
    val rows = run("q_scd2_merge").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4)))
    val byKey = rows.groupBy(_._1)
    val oddOrderCustomers = graft.core.Tables.orders(spark, sf)
      .groupBy("o_custkey").count().filter(col("count") % 2 === 1)
      .collect().map(_.getLong(0)).toSet
    byKey.foreach { case (k, vs) =>
      val versions = vs.map(v => v._2 -> v._3).toMap
      if (oddOrderCustomers(k))
        assert(versions == Map(1 -> false, 2 -> true), s"cust $k: $versions")
      else
        assert(versions == Map(1 -> true), s"cust $k: $versions")
    }
    // every customer appears; updated acctbal is exactly +100
    assert(byKey.keySet ==
      graft.core.Tables.customer(spark, sf).select("c_custkey")
        .collect().map(_.getLong(0)).toSet)
    val bal = run("q_scd2_merge").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    oddOrderCustomers.take(20).foreach { k =>
      assert(bal((k, 2)) == bal((k, 1)) + 100.0, s"cust $k")
    }
  }

  test("q_data_mix: kept fraction per source tracks its declared keep_pct") {
    val kept = run("q_data_mix").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    kept.groupBy(_._1).foreach { case (src, rs) =>
      val pct = (src.drop(3).toInt % 10) * 10 + 5
      rs.foreach { case (_, id) =>
        assert((id * 2654435761L) % 100 < pct, s"$src doc $id")
      }
    }
    // and nothing eligible is missing: recompute the full mix directly
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = docs.filter { case (s, id) =>
      (id * 2654435761L) % 100 < (s.drop(3).toInt % 10) * 10 + 5
    }.toSet
    assert(kept.toSet == expected)
  }

  test("q_join_salted: identical result to the plain unsalted join") {
    val salted = run("q_join_salted").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1), r.getLong(2))).toSeq
    val plain = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(graft.util.Det.dbl(sum(expr(
        "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))")))
        .as("revenue"),
        graft.util.Det.lng(count(lit(1))).as("n_items"))
      .orderBy("s_nationkey").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == plain)
  }

  test("q_join_salted: plan shuffles on (key, salt) — no broadcast of the replicated side") {
    val s = run("q_join_salted").queryExecution.executedPlan.toString
    assert(s.contains("ShuffledHashJoin") || s.contains("SortMergeJoin"),
      s.take(3000))
  }

  test("q_quantile_bucket: equi-depth — per-type bucket counts within one row of n/4") {
    val rows = run("q_quantile_bucket").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (t, rs) =>
      assert(rs.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3), s"$t buckets")
      val n = rs.map(_._3).sum
      rs.foreach { case (_, b, c) =>
        // interpolated cutpoints put each quartile within ±1 of n/4
        // (plus ties at the cut, which this data has none of at 2dp scale)
        assert(math.abs(c - n / 4.0) <= n * 0.02 + 2, s"$t bucket $b: $c of $n")
      }
    }
  }
}
