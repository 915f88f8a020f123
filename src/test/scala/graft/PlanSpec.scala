package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates (SURVEY.md §4.2, builder contract
  * "optimize for scale"): these assertions pin the *shape* of the plans
  * — pushdown reaching the parquet scan, pruned read schemas, broadcast
  * for dim tables, map-side partial aggregation, top-k pushdown, and no
  * accidental cartesian products anywhere in the 59-query inventory.
  * A regression that silently de-optimizes a plan fails here even while
  * results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def planOf(key: String): SparkPlan =
    SparkEntry.queries(key)(spark, sf).queryExecution.executedPlan

  private def planString(key: String): String = planOf(key).toString

  private def formatted(key: String): String = {
    val df = SparkEntry.queries(key)(spark, sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q_filter_pred: predicate reaches the parquet scan (PushedFilters)") {
    val s = formatted("q_filter_pred")
    assert(s.contains("PushedFilters: ["), s.takeRight(2000))
    assert(!s.matches("(?s).*PushedFilters: \\[\\].*"),
      "no filters pushed down:\n" + s.takeRight(2000))
  }

  test("q_project: scan reads only the projected columns") {
    val s = formatted("q_project")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(s).map(_.group(1)).toList
    assert(readSchemas.nonEmpty)
    // q_project selects a 2-3 column subset of a wider table; the scan
    // schema must not contain more than those columns
    assert(readSchemas.forall(_.split(",").length <= 3),
      s"unpruned read schema: $readSchemas")
  }

  test("q_join_broadcast: dim side broadcast, no shuffle of the fact side") {
    val s = planString("q_join_broadcast")
    assert(s.contains("BroadcastHashJoin"), s.take(2000))
  }

  test("q_tpch_q3 / q_tpch_q5: multi-join plans broadcast their dim tables") {
    assert(planString("q_tpch_q3").contains("BroadcastHashJoin"))
    assert(planString("q_tpch_q5").contains("BroadcastHashJoin"))
  }

  test("q_agg_hash: partial (map-side) + final aggregation") {
    val s = planString("q_agg_hash")
    assert("HashAggregate".r.findAllIn(s).size >= 2,
      "expected partial+final HashAggregate:\n" + s.take(2000))
  }

  test("q_sort_limit: top-k pushed down (TakeOrderedAndProject)") {
    assert(planString("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("no accidental CartesianProduct in any declared query") {
    // the kNN/ANN family broadcasts its probe side (BroadcastNestedLoop),
    // which is the intended all-pairs scan — CartesianProductExec with a
    // shuffled build side is never intended
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { k =>
      planString(k).contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("no unpartitioned Window (single-partition sort) in any declared query") {
    // a Window with an empty partitionSpec funnels the whole input through
    // one task — Spark itself warns "No Partition Defined for Window
    // operation". q_enrich previously did this for its global sequence;
    // ops/Sequence now assigns it with a bucketed two-pass scheme. This
    // gate keeps the anti-pattern out of every declared query for good.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { k =>
      val lp = SparkEntry.queries(k)(spark, sf).queryExecution.optimizedPlan
      lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }.nonEmpty
    }
    assert(offenders.isEmpty, s"unpartitioned windows in: $offenders")
  }

  test("q_ann_topk_agg: TopKByScore runs as partial + final aggregation") {
    val df = SparkEntry.queries("q_ann_topk_agg")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val aggLines = s.linesIterator.filter(_.contains("Aggregate")).toList
    // typed Aggregator buffers run in ObjectHashAggregate; partial
    // (map-side, before the exchange) + final = 2 nodes, with the
    // partial one carrying partial_topkbyscore
    assert(aggLines.size >= 2, s"expected partial+final agg:\n$s")
    assert(s.contains("partial_topkbyscore"),
      "no map-side partial top-k:\n" + aggLines.mkString("\n"))
  }

  test("q_colloc_lift: global top-100 compiles to TakeOrderedAndProject") {
    // orderBy(lift).limit(100) must not materialize a global sort —
    // per-partition top-k + merge is the only shape that survives a
    // full-corpus bigram table
    assert(planString("q_colloc_lift").contains("TakeOrderedAndProject"))
  }

  test("q_cdc_apply: rn=1 filter compiles to a per-key WindowGroupLimit") {
    // the changelog compaction must take top-1 per key BEFORE the
    // exchange; a plain Window + Filter would sort every key's full
    // change history
    assert(planString("q_cdc_apply").contains("WindowGroupLimit"))
  }

  test("q_scan_docstore: filter absorbed by the DSv2 reader, schema pruned") {
    val s = formatted("q_scan_docstore")
    assert(s.contains("GreaterThanOrEqual(n_chars,300)"), s.takeRight(2000))
    // the text column must not appear in the docstore read schema
    val scanLine = s.linesIterator.find(_.contains("docstore"))
    assert(scanLine.isDefined && !scanLine.get.contains("text"),
      s"text not pruned from docstore scan: ${scanLine.getOrElse("")}")
  }

  test("q_perplexity_kn: single-row type total broadcast, count tables joined by key") {
    val s = planString("q_perplexity_kn")
    // the B total (one row) must arrive via broadcast, never a shuffle
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"),
      s.take(3000))
    assert(!s.contains("CartesianProduct"), "shuffled cartesian in KN plan")
  }

  test("q_frame_hist: timed plan reads the payload FIXTURE, never the " +
    "documents table") {
    // r16: payload synthesis moved to a build-once parquet fixture so
    // the timed query prices the decode; the plan must scan only the
    // narrow MediaRow fixture — a documents scan here means the build
    // leaked back into the steady-state path
    val s = formatted("q_frame_hist")
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(s).map(_.group(1)).toList
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(rs =>
      rs.contains("payload") && !rs.contains("text")),
      s"expected fixture-only scan, got: $readSchemas")
    assert(!s.contains("documents.parquet"),
      "documents must not be scanned once the fixture exists")
  }

  test("q_tpch_q1: l_shipdate predicate survives NTZ normalization (PushedFilters)") {
    // Tables.normalizeTimestamps puts a Cast(NTZ -> LTZ) above every
    // scan when the testdata carries naive parquet timestamps; this
    // gate pins that Catalyst still pushes the date-range predicate
    // into the parquet reader — the property a 100 TB TPC-H-style
    // date-partitioned scan lives on.
    val s = formatted("q_tpch_q1")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(s).isDefined,
      "l_shipdate not pushed to the parquet scan:\n" + s.take(3000))
  }

  test("q_scan_orc: n_chars predicate pushed into the ORC scan") {
    val s = formatted("q_scan_orc")
    val orcScan = s.linesIterator.exists(_.contains("orc"))
    assert(orcScan, "no ORC scan in plan:\n" + s.take(2000))
    assert(s.contains("PushedFilters: [") &&
      "PushedFilters: \\[[^\\]]*n_chars".r.findFirstIn(s).isDefined,
      "n_chars not pushed to the ORC reader:\n" + s.take(3000))
  }

  test("q_scan_partitioned: source prunes directories, n_chars prunes row groups") {
    val s = formatted("q_scan_partitioned")
    // the partition predicate must be metadata-only (PartitionFilters),
    // never a post-scan data filter...
    assert("PartitionFilters: \\[[^\\]]*source".r.findFirstIn(s).isDefined,
      "source not a PartitionFilter:\n" + s.take(3000))
    // ...while the residual predicate still pushes into the parquet reader
    assert("PushedFilters: \\[[^\\]]*n_chars".r.findFirstIn(s).isDefined,
      "n_chars not pushed:\n" + s.take(3000))
  }

  test("q_dpp_join: dim filter becomes a runtime partition predicate (DPP)") {
    val s = formatted("q_dpp_join")
    assert(s.contains("dynamicpruningexpression"),
      "no dynamic partition pruning on the fact scan:\n" + s.take(4000))
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      "calendar dim not broadcast:\n" + s.take(3000))
  }

  test("q_bucket_prune: IN-lookup opens only the buckets its keys hash into") {
    val s = formatted("q_bucket_prune")
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(s)
    assert(m.isDefined, "no bucket pruning on the bucketed scan:\n" + s.take(3000))
    val (sel, tot) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(sel < tot, s"all $tot buckets selected — pruning didn't engage:\n" + s.take(2000))
    assert(sel <= 3, s"3 keys selected $sel buckets (> one bucket per key)")
  }

  test("native expressions stay inside whole-stage codegen") {
    // the dedup shingle scan must appear under a WholeStageCodegen span,
    // not as a fallback project; AQE finalizes the plan only on
    // execution, so run the query first
    val df = SparkEntry.queries("q_fingerprint")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    // `*(n)` is the whole-stage-codegen stage marker in the plan string;
    // the project evaluating shingle_hashes must carry one
    val shingleLine = s.linesIterator.find(_.contains("shingle_hashes("))
    assert(shingleLine.isDefined, s.take(3000))
    assert(shingleLine.get.contains("*("),
      "shingle_hashes project not codegen'd: " + shingleLine.get)
  }

  test("byte-based parallelism pins survive: REPARTITION_BY_NUM in the trap plans") {
    // SURVEY §4.2 r9: AQE coalescing and input-split parallelism are
    // both byte-based and both fold compute-heavy, byte-light stages
    // to ~1 task. The fixes are explicit fixed-count repartitions
    // (exempt from coalescing); this gate pins their presence so a
    // refactor can't silently drop them. q_link_jaccard: the
    // common-neighbor self-join pin; q_distinct_n_sketch: the
    // documentsSpread scan pin + the gram-rollup reduce pin.
    Seq("q_link_jaccard", "q_distinct_n_sketch", "q_chrf",
        "q_bootstrap_ci", "q_profile", "q_boilerplate",
        "q_dedup_substring").foreach { k =>
      val s = planString(k)
      assert(s.contains("REPARTITION_BY_NUM"),
        s"$k lost its fixed-count repartition pin:\n" + s.take(2000))
    }
  }
}
