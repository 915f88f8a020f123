package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan gates for the physical-layout operators
  * (`q_zorder`, `q_bloom_join`): the properties that make them
  * layout operators — clustering locality and filter soundness —
  * asserted directly, not just hash-compared.
  */
class LayoutShapesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def run(key: String) = SparkEntry.queries(key)(spark, sf)

  test("q_zorder: buckets conserve rows and cover tight rectangles") {
    val rows = run("q_zorder").collect()
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total, "row conservation")
    assert(rows.length <= 256, "at most 256 buckets")
    // locality: a Z-order bucket spans ≤ 1/4 of the global range in
    // EACH dimension (top 4 interleaved bits pin 2 high bits per dim);
    // a 1-D sort would leave the second dimension's span at ~100%.
    val priceMin = rows.map(_.getDouble(2)).min
    val priceMax = rows.map(_.getDouble(3)).max
    val custMin = rows.map(_.getLong(4)).min
    val custMax = rows.map(_.getLong(5)).max
    val priceSpan = priceMax - priceMin
    val custSpan = (custMax - custMin).toDouble
    rows.foreach { r =>
      assert(r.getDouble(3) - r.getDouble(2) <= priceSpan / 4 + 1e-9,
        s"price span of bucket ${r.getLong(0)}")
      assert((r.getLong(5) - r.getLong(4)).toDouble <= custSpan / 4 + 1e-9,
        s"cust span of bucket ${r.getLong(0)}")
    }
  }

  test("q_bloom_join: no false negatives, FP accounting consistent") {
    val r = run("q_bloom_join").collect().head
    val (total, bits, passed, truth, fps) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val trueDirect = {
      val c = graft.core.Tables.customer(spark, sf)
        .filter(org.apache.spark.sql.functions.col("c_mktsegment") === "BUILDING")
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      graft.core.Tables.orders(spark, sf).select("o_custkey").collect()
        .count(row => c.contains(row.getLong(0))).toLong
    }
    assert(truth == trueDirect, "exact match count")
    assert(passed >= truth, "a Bloom filter never drops a true match")
    assert(fps == passed - truth, "FP arithmetic")
    assert(passed <= total && bits <= 4096, "bounds")
  }

  test("q_bloom_join: filter and dim sides broadcast, fact scans once") {
    val plan = run("q_bloom_join").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "broadcast semi joins")
    assert(!plan.contains("SortMergeJoin"),
      "no shuffle join anywhere in a Bloom pre-filter plan")
  }

  test("q_compaction_plan equals a plain-Scala greedy replay and packs soundly") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val assigned: Seq[((String, Long), (Long, Long))] =
      docs.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
        var csum = 0L
        fs.sortBy(_._2).toSeq.map { case (_, id, sz) =>
          csum += sz
          ((src, (math.max(csum, 1L) - 1) / 65536L), (id, sz))
        }
      }
    val want = assigned.groupBy(_._1).map { case (key, fs) =>
      val ids = fs.map(_._2._1)
      key -> (fs.size.toLong, fs.map(_._2._2).sum, ids.min, ids.max)
    }
    val got = run("q_compaction_plan").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
    // soundness: bins conserve every file and byte, bins are contiguous
    // doc ranges, and no bin overflows the target by more than one file
    // (the cumulative-sum rule's contract)
    assert(got.values.map(_._1).sum == docs.length)
    assert(got.values.map(_._2).sum == docs.map(_._3).sum)
    got.groupBy(_._1._1).foreach { case (src, bins) =>
      val ordered = bins.toSeq.sortBy(_._1._2).map(_._2)
      ordered.sliding(2).foreach {
        case Seq((_, _, _, lastA), (_, _, firstB, _)) =>
          assert(lastA < firstB, s"$src bins out of order")
        case _ => ()
      }
      ordered.foreach { case (nFiles, bytes, _, _) =>
        assert(nFiles >= 1)
        assert(bytes < 65536L + docs.filter(_._1 == src).map(_._3).max,
          s"$src bin overflows by more than one file")
      }
    }
  }
}
