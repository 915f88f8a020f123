package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables._
import graft.util.Det._

/** Statistics-at-scale operators (SURVEY.md §2.22): DP-style noisy
  * release, Bayesian bootstrap confidence intervals, a two-sample
  * Kolmogorov–Smirnov test with a partitioned (never-global) ECDF,
  * and classifier calibration bins.
  *
  * Determinism (SURVEY.md §7.5): all "randomness" is md5-keyed — both
  * engines hash identical bytes to identical hex, so uniforms, Laplace
  * and exponential draws are pure functions of the data (q_feature_hash
  * precedent: conv(hex,16,10) ≡ DuckDB '0x'-cast). Weighted sums
  * accumulate round-6 DECIMAL terms (order-free); everything else is
  * single shared IEEE chains over exact aggregates.
  *
  * Scale shapes (PLANS.md): the KS ECDF uses the q_skyline bucketed
  * two-pass cumulative (within-bucket partitioned window + tiny
  * cross-bucket offset join) so no window ever sees one global
  * partition; the bootstrap explodes a fixed small replicate count and
  * aggregates map-side; calibration reuses the broadcast-centroid fold
  * of q_centroid_confusion.
  */
object StatsScaleQueries {

  /** md5-keyed uniform in (0,1): top 48 bits of the hex digest, offset
    * half a unit to stay strictly inside the interval. Identical text
    * on the DuckDB side modulo conv ⇔ '0x'-cast.
    */
  private def u01(keySql: String): String =
    s"(conv(substring(md5($keySql), 1, 12), 16, 10) + 0.5) / 281474976710656.0"

  private def u01Duck(keySql: String): String =
    s"(CAST(concat('0x', substr(md5($keySql), 1, 12)) AS BIGINT) + 0.5) / 281474976710656.0"

  // ---------------------------------------------------------------- dp count

  private val dpCount = QueryDef(
    "q_dp_count",
    "Differential-privacy-style noisy count release per event type " +
      "(Laplace mechanism, ε=1, sensitivity 1): exact counts plus " +
      "inverse-CDF Laplace noise b·sign(u−½)·ln(1−2|u−½|) driven by " +
      "an md5-keyed uniform — deterministic pseudo-noise, so the " +
      "released table is reproducible across runs and engines while " +
      "still shaped exactly like the mechanism (for real privacy the " +
      "key would be a secret salt; the plumbing is identical). One " +
      "map-side-combined aggregation to ≤5 rows; the noise chain is " +
      "shared expression text over the exact counts.",
    Some(s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
            |       round(count(*)
            |             - CASE WHEN ${u01Duck("event_type")} < 0.5 THEN -1.0 ELSE 1.0 END
            |               * ln(1 - 2 * abs(${u01Duck("event_type")} - 0.5)), 6) AS n_noisy
            |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) =>
      events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("cnt"))
        .selectExpr("event_type", "CAST(cnt AS BIGINT) AS n",
          s"""round(cnt
             | - CASE WHEN ${u01("event_type")} < 0.5 THEN -1.0D ELSE 1.0D END
             |   * ln(1 - 2 * abs(${u01("event_type")} - 0.5)), 6) AS n_noisy"""
            .stripMargin)
        .orderBy("event_type")
  )

  // ------------------------------------------------------------ bootstrap ci

  private val bootstrapCi = QueryDef(
    "q_bootstrap_ci",
    "Bayesian-bootstrap confidence interval for the mean event value " +
      "per type, 20 replicates: each (event, replicate) draws an " +
      "exponential weight −ln(u) from an md5-keyed uniform — all 20 " +
      "uniforms per event slice out of FOUR digests (24 bits each, " +
      "5 per digest), so the hash cost is 4 md5/event, not 20; " +
      "replicate means Σwx/Σw accumulate round-6 DECIMAL terms " +
      "(float order cannot matter), and the 5th/50th/95th " +
      "percentiles of the 20 replicate means form the interval — " +
      "uncertainty quantification without ever resampling rows. " +
      "Shape: a fixed ×20 explode on the scan (no shuffle grows), " +
      "one map-side-combined aggregation to types×20 cells, exact " +
      "percentile over each tiny 20-row group.",
    Some("""WITH dig AS (SELECT event_type, value,
           |         concat(md5(concat(CAST(event_id AS VARCHAR), '_0')),
           |                md5(concat(CAST(event_id AS VARCHAR), '_1')),
           |                md5(concat(CAST(event_id AS VARCHAR), '_2')),
           |                md5(concat(CAST(event_id AS VARCHAR), '_3'))) AS dg
           |       FROM events),
           |reps AS (SELECT event_type, value, r.rep,
           |         -ln((CAST(concat('0x', substr(dg, (r.rep - 1) * 6 + 1, 6)) AS BIGINT) + 0.5) / 16777216.0) AS w
           |       FROM dig CROSS JOIN (SELECT unnest(generate_series(1, 20)) AS rep) r),
           |m AS (SELECT event_type, rep,
           |        CAST(sum(CAST(round(w * value, 6) AS DECIMAL(28,6))) AS DOUBLE)
           |        / CAST(sum(CAST(round(w, 6) AS DECIMAL(28,6))) AS DOUBLE) AS mean_r
           |      FROM reps GROUP BY 1, 2)
           |SELECT event_type,
           |       round(quantile_cont(mean_r, 0.05), 6) AS ci_lo,
           |       round(quantile_cont(mean_r, 0.50), 6) AS ci_med,
           |       round(quantile_cont(mean_r, 0.95), 6) AS ci_hi
           |FROM m GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      // fixed-count repartition on event_id: the x20 explode + 4 md5 +
      // ln per event is the heaviest per-row chain on the events table,
      // and the single-split scan would serialize it (SURVEY §4.2 r9
      // byte-based-parallelism trap; profiled 6.7 s in ONE task)
      val reps = events(s, d)
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt,
          col("event_id"))
        .selectExpr("event_type", "value",
          """concat(md5(concat(CAST(event_id AS STRING), '_0')),
            |       md5(concat(CAST(event_id AS STRING), '_1')),
            |       md5(concat(CAST(event_id AS STRING), '_2')),
            |       md5(concat(CAST(event_id AS STRING), '_3'))) AS dg"""
            .stripMargin)
        .select(col("event_type"), col("value"), col("dg"),
          explode(expr("sequence(1, 20)")).as("rep"))
        .selectExpr("event_type", "value", "rep",
          "-ln((conv(substring(dg, (rep - 1) * 6 + 1, 6), 16, 10) + 0.5) / 16777216.0) AS w")
      val m = reps.groupBy("event_type", "rep")
        .agg((dbl(sum(round(col("w") * col("value"), 6)
            .cast(DecimalType(28, 6)))) /
          dbl(sum(round(col("w"), 6).cast(DecimalType(28, 6))))).as("mean_r"))
      m.groupBy("event_type")
        .agg(round(expr("percentile(mean_r, 0.05)"), 6).as("ci_lo"),
          round(expr("percentile(mean_r, 0.50)"), 6).as("ci_med"),
          round(expr("percentile(mean_r, 0.95)"), 6).as("ci_hi"))
        .orderBy("event_type")
    }
  )

  // ----------------------------------------------------------------- ks test

  private val ksTest = QueryDef(
    "q_ks_test",
    "Two-sample Kolmogorov–Smirnov statistic between the click and " +
      "view value distributions: D = max |F1 − F2| over the union of " +
      "observed values quantized to 0.1 (floor(value·10), a shared " +
      "exact chain). The ECDFs are cumulative counts over the " +
      "quantized-value histogram computed with the q_skyline bucketed " +
      "two-pass: within-bucket running sums on a PARTITIONED window " +
      "(qv div 512) plus a tiny cross-bucket offset self-join — no " +
      "single-partition sort at any cardinality; the oracle uses a " +
      "plain global cumulative window (DuckDB has no such " +
      "constraint).",
    Some("""WITH q AS (SELECT CAST(floor(value * 10) AS BIGINT) AS qv,
           |             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is1
           |           FROM events WHERE event_type IN ('click', 'view')),
           |vc AS (SELECT qv, sum(is1) AS c1, sum(1 - is1) AS c2 FROM q GROUP BY 1),
           |cum AS (SELECT qv,
           |          sum(c1) OVER (ORDER BY qv) AS r1,
           |          sum(c2) OVER (ORDER BY qv) AS r2
           |        FROM vc),
           |t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM vc)
           |SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
           |       round(max(abs(CAST(cum.r1 AS DOUBLE) / t.n1
           |                     - CAST(cum.r2 AS DOUBLE) / t.n2)), 6) AS d_stat
           |FROM cum, t GROUP BY t.n1, t.n2""".stripMargin),
    (s, d) => {
      val q = events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(expr("CAST(floor(value * 10) AS BIGINT)").as("qv"),
          when(col("event_type") === "click", 1).otherwise(0).as("is1"))
      val vc = q.groupBy("qv")
        .agg(sum("is1").as("c1"), sum(lit(1) - col("is1")).as("c2"))
        .withColumn("bucket", expr("qv DIV 512"))
      val wIn = Window.partitionBy("bucket").orderBy("qv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inB = vc.withColumn("i1", sum("c1").over(wIn))
        .withColumn("i2", sum("c2").over(wIn))
      val bTot = vc.groupBy("bucket")
        .agg(sum("c1").as("b1"), sum("c2").as("b2"))
      val off = bTot.as("a")
        .join(bTot.as("b"), col("b.bucket") < col("a.bucket"), "left")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("b.b1")), lit(0L)).as("o1"),
          coalesce(sum(col("b.b2")), lit(0L)).as("o2"))
      val cum = inB.join(broadcast(off), "bucket")
        .select(col("qv"), (col("o1") + col("i1")).as("r1"),
          (col("o2") + col("i2")).as("r2"))
      val t = vc.agg(sum("c1").as("n1"), sum("c2").as("n2"))
      cum.crossJoin(broadcast(t))
        .groupBy("n1", "n2")
        .agg(round(max(abs(dbl(col("r1")) / col("n1") -
          dbl(col("r2")) / col("n2"))), 6).as("d_stat"))
        .select(lng(col("n1")).as("n1"), lng(col("n2")).as("n2"),
          col("d_stat"))
    }
  )

  // -------------------------------------------------------------- calibration

  private val calibration = QueryDef(
    "q_calibration",
    "Calibration (reliability) bins for the nearest-centroid " +
      "classifier: per vector, confidence = b/(a+b) where a = " +
      "distance to the predicted (nearest) centroid and b = distance " +
      "to the runner-up; binned into confidence QUINTILES (high-" +
      "dimensional distances concentrate, so equal-width bins " +
      "collapse into one — equal-count bins via broadcast percentile " +
      "thresholds, the q_rfm pattern) with per-bin count, mean " +
      "confidence (round-6 DECIMAL sum) and observed accuracy. A " +
      "well-calibrated space shows accuracy rising with confidence — " +
      "the screen run before trusting auto-labels. Reuses the " +
      "broadcast-centroid exact-DECIMAL distance fold; the per-" +
      "vector top-2 is a vec_id-partitioned window; the final table " +
      "is 5 rows.",
    Some(s"""WITH cent AS (${MlEvalQueries.CentroidSql}),
            |el AS (SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS dim,
            |              unnest(embedding) AS v
            |       FROM embeddings),
            |dist AS (SELECT el.vec_id, el.label AS true_label, cent.clabel,
            |           sqrt(CAST(sum(${MlEvalQueries.DistTermSql}) AS DOUBLE) / 1000000000000.0) AS dd
            |         FROM el JOIN cent USING (dim) GROUP BY 1, 2, 3),
            |rk AS (SELECT vec_id, true_label, clabel, dd,
            |         row_number() OVER (PARTITION BY vec_id ORDER BY dd, clabel) AS rn
            |       FROM dist),
            |pv AS (SELECT a.vec_id, a.true_label, a.clabel AS pred, a.dd AS da, b.dd AS db
            |       FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
            |sc AS (SELECT vec_id, (pred = true_label) AS hit,
            |         db / (da + db) AS conf
            |       FROM pv),
            |th AS (SELECT quantile_cont(conf, 0.2) AS t1, quantile_cont(conf, 0.4) AS t2,
            |              quantile_cont(conf, 0.6) AS t3, quantile_cont(conf, 0.8) AS t4
            |       FROM sc),
            |b AS (SELECT sc.hit, sc.conf,
            |        CASE WHEN sc.conf < th.t1 THEN 0 WHEN sc.conf < th.t2 THEN 1
            |             WHEN sc.conf < th.t3 THEN 2 WHEN sc.conf < th.t4 THEN 3
            |             ELSE 4 END AS bin
            |      FROM sc, th)
            |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
            |       round(CAST(sum(CAST(round(conf, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_conf,
            |       round(CAST(count(*) FILTER (WHERE hit) AS DOUBLE) / count(*), 6) AS accuracy
            |FROM b GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, d) => {
      val dist = MlEvalQueries.centroidDistances(s, d)
        .select(col("vec_id"), col("true_label"), col("clabel"),
          sqrt(dbl(col("d2")) / 1000000000000L).as("dd"))
      val w = Window.partitionBy("vec_id").orderBy(col("dd"), col("clabel"))
      val rk = dist.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
      val pv = rk.filter(col("rn") === 1)
        .select(col("vec_id"), col("true_label"), col("clabel").as("pred"),
          col("dd").as("da"))
        .join(rk.filter(col("rn") === 2)
          .select(col("vec_id"), col("dd").as("db")), "vec_id")
      val conf = col("db") / (col("da") + col("db"))
      val sc = pv.select((col("pred") === col("true_label")).as("hit"),
        conf.as("conf"))
      val th = sc.agg(expr("percentile(conf, 0.2)").as("t1"),
        expr("percentile(conf, 0.4)").as("t2"),
        expr("percentile(conf, 0.6)").as("t3"),
        expr("percentile(conf, 0.8)").as("t4"))
      sc.crossJoin(broadcast(th))
        .select(col("hit"), col("conf"),
          when(col("conf") < col("t1"), 0L)
            .when(col("conf") < col("t2"), 1L)
            .when(col("conf") < col("t3"), 2L)
            .when(col("conf") < col("t4"), 3L)
            .otherwise(4L).as("bin"))
        .groupBy("bin")
        .agg(lng(count(lit(1))).as("n"),
          round(dbl(sum(round(col("conf"), 6).cast(DecimalType(18, 6)))) /
            count(lit(1)), 6).as("mean_conf"),
          round(dbl(count(when(col("hit"), 1))) / count(lit(1)), 6)
            .as("accuracy"))
        .orderBy("bin")
    }
  )

  // -------------------------------------------------------------- regression

  private val regression = QueryDef(
    "q_regression",
    "OLS linear regression of event value on hour-of-day per event " +
      "type (slope + intercept) — the trend fit behind seasonality " +
      "detrending. All five sufficient statistics are EXACT: integer " +
      "x sums, DECIMAL(18,2) y sums, int×DECIMAL cross sums; slope " +
      "and intercept are one shared double chain over the exact " +
      "co-moments (q_corr discipline — closed-form OLS needs no " +
      "iteration and no float accumulation). One map-side-combined " +
      "fact aggregation to ≤5 rows.",
    Some("""WITH p AS (SELECT event_type,
           |             (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS x,
           |             CAST(value AS DECIMAL(18,2)) AS y
           |           FROM events),
           |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
           |        sum(x * x) AS sxx, sum(y) AS sy, sum(x * y) AS sxy
           |      FROM p GROUP BY 1)
           |SELECT event_type, CAST(n AS BIGINT) AS n,
           |       round(CAST(n * sxy - sx * sy AS DOUBLE)
           |             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
           |       round((CAST(sy AS DOUBLE)
           |              - CAST(n * sxy - sx * sy AS DOUBLE)
           |                / CAST(n * sxx - sx * sx AS DOUBLE)
           |                * CAST(sx AS DOUBLE)) / n, 6) AS intercept
           |FROM m ORDER BY event_type""".stripMargin),
    (s, d) => {
      val p = events(s, d).select(col("event_type"),
        ((unix_micros(col("ts")) / 3600000000L).cast("long") % 24).as("x"),
        money(col("value")).as("y"))
      val m = p.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"))
      val num = dbl(col("n") * col("sxy") - col("sx") * col("sy"))
      val den = dbl(col("n") * col("sxx") - col("sx") * col("sx"))
      m.select(col("event_type"), lng(col("n")).as("n"),
          round(num / den, 6).as("slope"),
          round((dbl(col("sy")) - num / den * dbl(col("sx"))) / col("n"), 6)
            .as("intercept"))
        .orderBy("event_type")
    }
  )

  // --------------------------------------------------------------------- auc

  private val auc = QueryDef(
    "q_auc",
    "ROC AUC of the nearest-centroid classifier's confidence score " +
      "predicting a correct classification, via the exact rank-sum " +
      "(Mann–Whitney) identity with tie correction: AUC = Σ_s " +
      "np(s)·(2·nn_below(s) + nn(s)) / (2·NP·NN) over distinct " +
      "integer-scaled scores — no sampled thresholds, no trapezoids. " +
      "Scores come from the shared broadcast-centroid fold " +
      "(q_calibration's confidence); the cumulative negative count " +
      "uses the q_skyline bucketed two-pass (partitioned window + " +
      "tiny offset join), so the ECDF never needs a global sort; the " +
      "final statistic is exact BIGINT arithmetic with one division.",
    Some(s"""WITH cent AS (${MlEvalQueries.CentroidSql}),
            |el AS (SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS dim,
            |              unnest(embedding) AS v
            |       FROM embeddings),
            |dist AS (SELECT el.vec_id, el.label AS true_label, cent.clabel,
            |           sqrt(CAST(sum(${MlEvalQueries.DistTermSql}) AS DOUBLE) / 1000000000000.0) AS dd
            |         FROM el JOIN cent USING (dim) GROUP BY 1, 2, 3),
            |rk AS (SELECT vec_id, true_label, clabel, dd,
            |         row_number() OVER (PARTITION BY vec_id ORDER BY dd, clabel) AS rn
            |       FROM dist),
            |pv AS (SELECT a.vec_id, (a.clabel = a.true_label) AS hit,
            |         CAST(floor(b.dd / (a.dd + b.dd) * 1000000000 + 0.5) AS BIGINT) AS si
            |       FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
            |cnt AS (SELECT si, count(*) FILTER (WHERE hit) AS np,
            |          count(*) FILTER (WHERE NOT hit) AS nn
            |        FROM pv GROUP BY 1),
            |cum AS (SELECT si, np, nn,
            |          coalesce(sum(nn) OVER (ORDER BY si
            |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nn_below
            |        FROM cnt),
            |t AS (SELECT sum(np) AS tp, sum(nn) AS tn FROM cnt)
            |SELECT CAST(t.tp AS BIGINT) AS n_pos, CAST(t.tn AS BIGINT) AS n_neg,
            |       round(CAST(sum(cum.np * (2 * cum.nn_below + cum.nn)) AS DOUBLE)
            |             / CAST(2 * t.tp * t.tn AS DOUBLE), 6) AS auc
            |FROM cum, t GROUP BY t.tp, t.tn""".stripMargin),
    (s, d) => {
      val dist = MlEvalQueries.centroidDistances(s, d)
        .select(col("vec_id"), col("true_label"), col("clabel"),
          sqrt(dbl(col("d2")) / 1000000000000L).as("dd"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("dd"), col("clabel"))
      val rk = dist.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
      val pv = rk.filter(col("rn") === 1)
        .select(col("vec_id"),
          (col("clabel") === col("true_label")).as("hit"),
          col("dd").as("da"))
        .join(rk.filter(col("rn") === 2)
          .select(col("vec_id"), col("dd").as("db")), "vec_id")
        .select(col("hit"),
          expr("CAST(floor(db / (da + db) * 1000000000 + 0.5) AS BIGINT)")
            .as("si"))
      val cnt = pv.groupBy("si")
        .agg(count(when(col("hit"), 1)).as("np"),
          count(when(!col("hit"), 1)).as("nn"))
        .withColumn("bucket", expr("si DIV 4194304"))
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy("si")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          -1)
      val inB = cnt.withColumn("inb",
        coalesce(sum("nn").over(wIn), lit(0L)))
      val bTot = cnt.groupBy("bucket").agg(sum("nn").as("bn"))
      val off = bTot.as("a")
        .join(bTot.as("b"), col("b.bucket") < col("a.bucket"), "left")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("b.bn")), lit(0L)).as("off"))
      val cum = inB.join(broadcast(off), "bucket")
        .select(col("si"), col("np"), col("nn"),
          (col("off") + col("inb")).as("nn_below"))
      val t = cnt.agg(sum("np").as("tp"), sum("nn").as("tn"))
      cum.crossJoin(broadcast(t))
        .groupBy("tp", "tn")
        .agg(round(dbl(sum(col("np") * (lit(2) * col("nn_below") + col("nn")))) /
          dbl(lit(2) * col("tp") * col("tn")), 6).as("auc"))
        .select(lng(col("tp")).as("n_pos"), lng(col("tn")).as("n_neg"),
          col("auc"))
    }
  )

  // ---------------------------------------------------------------- pr curve

  private val prCurve = QueryDef(
    "q_pr_curve",
    "Precision–recall curve of the centroid classifier at every " +
      "distinct confidence threshold (q_auc's companion): predicting " +
      "'correct' when confidence ≥ s gives tp/fp as cumulative-from-" +
      "ABOVE counts over the per-score histogram — the q_skyline " +
      "bucketed two-pass run descending (partitioned windows + tiny " +
      "offset join, no global sort); precision and recall are single " +
      "divisions of exact BIGINTs per threshold row.",
    Some(s"""WITH cent AS (${MlEvalQueries.CentroidSql}),
            |el AS (SELECT vec_id, label, unnest(generate_series(1, len(embedding))) AS dim,
            |              unnest(embedding) AS v
            |       FROM embeddings),
            |dist AS (SELECT el.vec_id, el.label AS true_label, cent.clabel,
            |           sqrt(CAST(sum(${MlEvalQueries.DistTermSql}) AS DOUBLE) / 1000000000000.0) AS dd
            |         FROM el JOIN cent USING (dim) GROUP BY 1, 2, 3),
            |rk AS (SELECT vec_id, true_label, clabel, dd,
            |         row_number() OVER (PARTITION BY vec_id ORDER BY dd, clabel) AS rn
            |       FROM dist),
            |pv AS (SELECT a.vec_id, (a.clabel = a.true_label) AS hit,
            |         CAST(floor(b.dd / (a.dd + b.dd) * 1000000000 + 0.5) AS BIGINT) AS si
            |       FROM rk a JOIN rk b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2),
            |cnt AS (SELECT si, count(*) FILTER (WHERE hit) AS np,
            |          count(*) FILTER (WHERE NOT hit) AS nn
            |        FROM pv GROUP BY 1),
            |cum AS (SELECT si,
            |          sum(np) OVER (ORDER BY si DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
            |          sum(nn) OVER (ORDER BY si DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp
            |        FROM cnt),
            |t AS (SELECT sum(np) AS tpos FROM cnt)
            |SELECT cum.si AS threshold, CAST(cum.tp AS BIGINT) AS tp,
            |       CAST(cum.fp AS BIGINT) AS fp,
            |       round(CAST(cum.tp AS DOUBLE) / (cum.tp + cum.fp), 6) AS precision,
            |       round(CAST(cum.tp AS DOUBLE) / t.tpos, 6) AS recall
            |FROM cum, t ORDER BY threshold DESC""".stripMargin),
    (s, d) => {
      val dist = MlEvalQueries.centroidDistances(s, d)
        .select(col("vec_id"), col("true_label"), col("clabel"),
          sqrt(dbl(col("d2")) / 1000000000000L).as("dd"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("dd"), col("clabel"))
      val rk = dist.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
      val pv = rk.filter(col("rn") === 1)
        .select(col("vec_id"),
          (col("clabel") === col("true_label")).as("hit"),
          col("dd").as("da"))
        .join(rk.filter(col("rn") === 2)
          .select(col("vec_id"), col("dd").as("db")), "vec_id")
        .select(col("hit"),
          expr("CAST(floor(db / (da + db) * 1000000000 + 0.5) AS BIGINT)")
            .as("si"))
      val cnt = pv.groupBy("si")
        .agg(count(when(col("hit"), 1)).as("np"),
          count(when(!col("hit"), 1)).as("nn"))
        .withColumn("bucket", expr("si DIV 4194304"))
      // cumulative FROM ABOVE: descending within-bucket windows plus
      // offsets from strictly-higher buckets
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy("bucket").orderBy(col("si").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val inB = cnt.withColumn("ip", sum("np").over(wIn))
        .withColumn("in_", sum("nn").over(wIn))
      val bTot = cnt.groupBy("bucket")
        .agg(sum("np").as("bp"), sum("nn").as("bn"))
      val off = bTot.as("a")
        .join(bTot.as("b"), col("b.bucket") > col("a.bucket"), "left")
        .groupBy(col("a.bucket").as("bucket"))
        .agg(coalesce(sum(col("b.bp")), lit(0L)).as("op"),
          coalesce(sum(col("b.bn")), lit(0L)).as("on"))
      val cum = inB.join(broadcast(off), "bucket")
        .select(col("si"), (col("op") + col("ip")).as("tp"),
          (col("on") + col("in_")).as("fp"))
      val t = cnt.agg(sum("np").as("tpos"))
      cum.crossJoin(broadcast(t))
        .select(col("si").as("threshold"), lng(col("tp")).as("tp"),
          lng(col("fp")).as("fp"),
          round(dbl(col("tp")) / (col("tp") + col("fp")), 6).as("precision"),
          round(dbl(col("tp")) / col("tpos"), 6).as("recall"))
        .orderBy(col("threshold").desc)
    }
  )

  /** Population stability index — the production drift monitor run
    * between every scoring batch and its training reference (the
    * binned complement of q_ks_test's sup-norm and q_embed_drift's
    * embedding-space readout): 10 equal-width bins fitted on the
    * REFERENCE period only (first half of the event range), current
    * traffic clamped into them, PSI = Σ (p−q)·ln(p/q) over
    * Laplace-smoothed (+1) bin masses. Smoothing plus the explicit
    * 0..9 bin spine makes empty bins well-defined instead of
    * engine-divergent (the ADVICE r10 division-guard discipline);
    * hi = lo degenerates to bin 0 by the shared CASE guard.
    *
    * Determinism: bin edges are one shared IEEE chain over the exact
    * ref min/max; bin counts are exact BIGINTs; each psi term is one
    * shared ln chain rounded to the 9-grid; the total sums the
    * ROUNDED terms as exact decimal, so no float order exists.
    *
    * Scale: two fact passes (one min/max rollup, one binning
    * aggregation, both map-side combined), everything downstream is
    * 10-row frames with single-row broadcasts — the same shape at any
    * corpus size.
    */
  private val psi = QueryDef(
    "q_psi",
    "Population stability index of event value between the reference " +
      "(Jan 1-15) and current (Jan 16+) periods: 10 equal-width " +
      "reference-fitted bins, Laplace-smoothed masses, per-bin 9-grid " +
      "psi terms and the decimal-summed total on every row.",
    Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events
           |           WHERE ts < TIMESTAMP '2024-01-16'),
           |e AS (SELECT CASE WHEN hi = lo THEN 0
           |             ELSE greatest(0, least(9, CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT))) END AS bin,
           |             ts < TIMESTAMP '2024-01-16' AS is_ref
           |      FROM events CROSS JOIN b),
           |cnts AS (SELECT bin, sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS rn,
           |                sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS cn
           |         FROM e GROUP BY 1),
           |spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
           |j AS (SELECT s.bin, CAST(coalesce(c.rn, 0) AS BIGINT) AS ref_n,
           |             CAST(coalesce(c.cn, 0) AS BIGINT) AS cur_n
           |      FROM spine s LEFT JOIN cnts c ON c.bin = s.bin),
           |t AS (SELECT sum(ref_n) AS rt, sum(cur_n) AS ct FROM j),
           |k AS (SELECT bin, ref_n, cur_n,
           |        round((CAST(ref_n + 1 AS DOUBLE) / (rt + 10) - CAST(cur_n + 1 AS DOUBLE) / (ct + 10))
           |              * ln((CAST(ref_n + 1 AS DOUBLE) / (rt + 10)) / (CAST(cur_n + 1 AS DOUBLE) / (ct + 10))), 9) AS psi_term
           |      FROM j CROSS JOIN t),
           |tt AS (SELECT CAST(sum(CAST(psi_term AS DECIMAL(18,9))) AS DOUBLE) AS psi_total FROM k)
           |SELECT bin, ref_n, cur_n, psi_term, psi_total
           |FROM k CROSS JOIN tt ORDER BY bin""".stripMargin),
    (s, d) => {
      val split = lit("2024-01-16").cast("timestamp")
      val ev = events(s, d).select(col("ts"), col("value"))
      val b = ev.filter(col("ts") < split)
        .agg(min("value").as("lo"), max("value").as("hi"))
      val cnts = ev.crossJoin(broadcast(b))
        .select(when(col("hi") === col("lo"), lit(0L))
            .otherwise(greatest(lit(0L), least(lit(9L),
              floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 10)
                .cast("long")))).as("bin"),
          (col("ts") < split).as("is_ref"))
        .groupBy("bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("rn"),
          sum(when(col("is_ref"), 0L).otherwise(1L)).as("cn"))
      val j = s.range(10).select(col("id").as("bin"))
        .join(cnts, Seq("bin"), "left")
        .select(col("bin"), lng(coalesce(col("rn"), lit(0L))).as("ref_n"),
          lng(coalesce(col("cn"), lit(0L))).as("cur_n"))
        .persist()
      val t = j.agg(sum("ref_n").as("rt"), sum("cur_n").as("ct"))
      val p = dbl(col("ref_n") + 1) / (col("rt") + 10)
      val q = dbl(col("cur_n") + 1) / (col("ct") + 10)
      val k = j.crossJoin(broadcast(t))
        .select(col("bin"), col("ref_n"), col("cur_n"),
          round((p - q) * log(p / q), 9).as("psi_term"))
        .persist()
      val tt = k.agg(dbl(sum(col("psi_term").cast(DecimalType(18, 9))))
        .as("psi_total"))
      materializeThenRelease(k.crossJoin(broadcast(tt)), j, k)
        .orderBy("bin")
    }
  )

  /** Split-conformal prediction intervals (Vovk; Lei et al., JASA
    * 2018) — the DISTRIBUTION-FREE uncertainty wrapper modern ML
    * serving puts around any point model, completing the
    * uncertainty family (q_bootstrap_ci = resampling CI on a MEAN,
    * q_calibration = probability reliability; this bounds PER-ROW
    * prediction error with finite-sample coverage). Three-way split
    * by user_id % 4: {0,1} train, {2} calibration, {3} test. Model =
    * per-type train mean (round-6 grid); nonconformity = |y − μ̂|;
    * q̂ = the 0.9 interpolated quantile of calibration scores; the
    * readout is test coverage of the interval μ̂ ± q̂, which the
    * conformal guarantee pins near 90%.
    *
    * Determinism: μ̂ is one division of an exact decimal sum, round-6,
    * cast back to DECIMAL(18,6) so every score y − μ̂ is EXACT decimal
    * (the gbdt residual discipline); the quantile interpolates doubles
    * under the percentile ⇔ quantile_cont parity (q_quantiles
    * precedent), round-6; coverage compares exact decimal scores
    * against the 6-grid q̂ cast to decimal — no float accumulation
    * anywhere.
    *
    * Scale: two fact aggregations (train means; per-type calibration
    * quantile — partitioned by type, the q_quantiles shape) + one
    * covered count over the test split with both tiny frames
    * broadcast. Output = one row per event type.
    */
  private val conformal = QueryDef(
    "q_conformal",
    "Split-conformal 90% prediction interval per event type: " +
      "per-type train-split mean (6-grid), absolute-residual " +
      "nonconformity scores exact in decimal, calibration-split 0.9 " +
      "interpolated quantile as the interval half-width, and the " +
      "test-split coverage the conformal guarantee pins near 0.9.",
    Some("""WITH f AS (SELECT event_type, user_id % 4 AS sp,
           |                  CAST(value AS DECIMAL(18,2)) AS y
           |           FROM events),
           |m AS (SELECT event_type,
           |             CAST(round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS mu
           |      FROM f WHERE sp <= 1 GROUP BY 1),
           |sc AS (SELECT f.event_type, f.sp, abs(f.y - m.mu) AS s
           |       FROM f JOIN m ON m.event_type = f.event_type WHERE f.sp >= 2),
           |q AS (SELECT event_type, count(*) AS n_cal,
           |             round(quantile_cont(CAST(s AS DOUBLE), 0.9), 6) AS q_hat
           |      FROM sc WHERE sp = 2 GROUP BY 1)
           |SELECT sc.event_type, CAST(q.n_cal AS BIGINT) AS n_cal, q.q_hat,
           |       CAST(count(*) AS BIGINT) AS n_test,
           |       CAST(sum(CASE WHEN sc.s <= CAST(q.q_hat AS DECIMAL(18,6))
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           |       round(CAST(sum(CASE WHEN sc.s <= CAST(q.q_hat AS DECIMAL(18,6))
           |                           THEN 1 ELSE 0 END) AS DOUBLE) / nullif(count(*), 0), 6) AS coverage
           |FROM sc JOIN q ON q.event_type = sc.event_type
           |WHERE sc.sp = 3
           |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin),
    (s, d) => {
      val dec6 = DecimalType(18, 6)
      val f = events(s, d)
        .select(col("event_type"), (col("user_id") % 4).as("sp"),
          money(col("value")).as("y"))
      val m = f.filter(col("sp") <= 1).groupBy("event_type")
        .agg(round(dbl(sum(col("y"))) / count(lit(1)), 6).cast(dec6).as("mu"))
      val sc = f.filter(col("sp") >= 2)
        .join(broadcast(m), "event_type")
        .select(col("event_type"), col("sp"), abs(col("y") - col("mu")).as("s"))
        .persist()
      val q = sc.filter(col("sp") === 2).groupBy("event_type")
        .agg(count(lit(1)).as("n_cal"),
          round(expr("percentile(CAST(s AS DOUBLE), 0.9)"), 6).as("q_hat"))
      val covered = when(col("s") <= col("q_hat").cast(dec6), 1L).otherwise(0L)
      sc.filter(col("sp") === 3)
        .join(broadcast(q), "event_type")
        .groupBy(col("event_type"), lng(col("n_cal")).as("n_cal"), col("q_hat"))
        .agg(lng(count(lit(1))).as("n_test"), lng(sum(covered)).as("n_covered"))
        .select(col("event_type"), col("n_cal"), col("q_hat"), col("n_test"),
          col("n_covered"),
          // nullif guard (ADVICE r11 discipline): n_test is structurally
          // > 0 here, but both engines must agree NULL if it ever isn't
          round(dbl(col("n_covered")) / nullif(col("n_test"), lit(0L)), 6)
            .as("coverage"))
        .transform(materializeThenRelease(_, sc))
        .orderBy("event_type")
    }
  )

  /** Isotonic (monotone) calibration by pool-adjacent-violators — the
    * FIT that q_calibration only measures: q_calibration reports
    * binned reliability (is P(y|score-bin) monotone in the bin?);
    * this REPAIRS it, producing the non-decreasing step function
    * production scorers apply before thresholding (isotonic
    * regression is the standard non-parametric alternative to Platt
    * scaling). PAV itself is sequential, but over BINNED scores it
    * has the closed minimax form iso(k) = max_{i≤k} min_{j≥k}
    * mean(y over bins i..j) — bins-sized algebra, no iteration.
    *
    * Determinism: interval means are ONE division of exact BIGINTs
    * (label sums / counts), rounded to the 9-grid; min/max compare
    * the 9-grid so both engines pool identically; output rates
    * round-6. Scale: one map-side-combined fact pass to ≤ 10 bins;
    * the minimax runs on bins² ≤ 100-row broadcast-tiny frames
    * (the q_stump bounded-self-join discipline — no window at all).
    */
  private val isotonic = QueryDef(
    "q_isotonic",
    "Isotonic calibration of the purchase rate over 10 equal-width " +
      "value bins via the minimax closed form of pool-adjacent-" +
      "violators: per bin the raw rate and the fitted non-decreasing " +
      "rate (exact integer interval means on the 9-grid).",
    Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |e AS (SELECT CASE WHEN hi = lo THEN 0
           |             ELSE greatest(0, least(9, CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT))) END AS bin,
           |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           |      FROM events CROSS JOIN b),
           |cells AS (SELECT bin, CAST(sum(y) AS BIGINT) AS g, CAST(count(*) AS BIGINT) AS n
           |          FROM e GROUP BY 1),
           |pm AS (SELECT a.bin AS i, z.bin AS j,
           |              round(CAST(sum(c.g) AS DOUBLE) / sum(c.n), 9) AS m
           |       FROM cells a JOIN cells z ON z.bin >= a.bin
           |       JOIN cells c ON c.bin BETWEEN a.bin AND z.bin
           |       GROUP BY 1, 2),
           |mn AS (SELECT k.bin AS bin, p.i, min(p.m) AS lo_m
           |       FROM cells k JOIN pm p ON p.i <= k.bin AND p.j >= k.bin
           |       GROUP BY 1, 2),
           |iso AS (SELECT bin, max(lo_m) AS iso9 FROM mn GROUP BY 1)
           |SELECT c.bin, c.n, c.g,
           |       round(CAST(c.g AS DOUBLE) / c.n, 6) AS raw_rate,
           |       round(i.iso9, 6) AS iso_rate
           |FROM cells c JOIN iso i ON i.bin = c.bin
           |ORDER BY c.bin""".stripMargin),
    (s, d) => {
      val ev = events(s, d).select(col("value"), col("event_type"))
      val b = ev.agg(min("value").as("lo"), max("value").as("hi"))
      val cells = ev.crossJoin(broadcast(b))
        .select(when(col("hi") === col("lo"), lit(0L))
            .otherwise(greatest(lit(0L), least(lit(9L),
              floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 10)
                .cast("long")))).as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("bin")
        .agg(lng(sum(col("y"))).as("g"), lng(count(lit(1))).as("n"))
        .persist()
      // interval means over observed bins: bins² pairs, exact-BIGINT
      // sums, ONE division on the 9-grid (bounded self-joins — the
      // q_stump cumsum discipline, no window)
      val pm = cells.as("a")
        .join(cells.select(col("bin").as("jb")).as("z"), col("jb") >= col("a.bin"))
        .join(cells.select(col("bin").as("cb"), col("g").as("cg"),
          col("n").as("cn")).as("c"),
          col("cb").between(col("a.bin"), col("jb")))
        .groupBy(col("a.bin").as("i"), col("jb").as("j"))
        .agg(round(dbl(sum(col("cg"))) / sum(col("cn")), 9).as("m"))
      val mn = cells.select(col("bin")).as("k")
        .join(pm, col("i") <= col("bin") && col("j") >= col("bin"))
        .groupBy(col("bin"), col("i"))
        .agg(min(col("m")).as("lo_m"))
      val iso = mn.groupBy("bin").agg(max(col("lo_m")).as("iso9"))
      cells.join(broadcast(iso), "bin")
        .select(col("bin"), col("n"), col("g"),
          round(dbl(col("g")) / col("n"), 6).as("raw_rate"),
          round(col("iso9"), 6).as("iso_rate"))
        .transform(materializeThenRelease(_, cells))
        .orderBy("bin")
    }
  )

  /** Stratified propensity-style treatment-effect estimate — the
    * OBSERVATIONAL complement to q_abtest's randomized z-test (when
    * you cannot randomize, you stratify on confounders and compare
    * within strata; Cochran's classic subclassification estimator).
    * Units are users; treatment = heavy week-1 error exposure (≥ 3
    * error events before Jan 8); outcome = weeks-2+ purchase value;
    * strata = fixed week-1 activity buckets (the confounder: active
    * users both err more and buy more). Per stratum the treated/
    * control counts and mean outcomes, the within-stratum difference,
    * and the treated-weighted ATT Σ (n_t,s / N_t)·diff_s on every row.
    *
    * Determinism: outcome sums are exact DECIMAL; means are one
    * division rounded 6 and differenced on the 6-grid; ATT weights
    * each 6-grid diff by exact integer ratios, rounds terms to the
    * 9-grid and sums as exact decimal. nullif guards a stratum with
    * no control (or no treated) users.
    *
    * Scale: ONE fact pass to a user-level rollup (the q_retention
    * shape), then strata-sized frames with single-row broadcasts;
    * nothing row-level survives the first groupBy.
    */
  private val propensity = QueryDef(
    "q_propensity",
    "Stratified observational treatment-effect estimate: treatment = " +
      "heavy week-1 error exposure, outcome = later purchase value, " +
      "strata = fixed week-1 activity buckets; per-stratum treated/" +
      "control means and diff, with the treated-weighted ATT.",
    Some("""WITH u AS (SELECT user_id,
           |    CAST(sum(CASE WHEN event_type = 'error' AND ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS BIGINT) AS e1,
           |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS BIGINT) AS a1,
           |    sum(CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-08'
           |             THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
           |  FROM events GROUP BY 1),
           |su AS (SELECT least(3, greatest(0, a1 - 12) // 3) AS stratum,
           |              e1 >= 3 AS treated, y FROM u),
           |cell AS (SELECT stratum,
           |    CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           |    CAST(sum(CASE WHEN treated THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
           |    sum(CASE WHEN treated THEN y ELSE CAST(0 AS DECIMAL(18,2)) END) AS sy_t,
           |    sum(CASE WHEN treated THEN CAST(0 AS DECIMAL(18,2)) ELSE y END) AS sy_c
           |  FROM su GROUP BY 1),
           |m AS (SELECT stratum, n_t, n_c,
           |             round(CAST(sy_t AS DOUBLE) / nullif(n_t, 0), 6) AS mean_t,
           |             round(CAST(sy_c AS DOUBLE) / nullif(n_c, 0), 6) AS mean_c
           |      FROM cell),
           |d AS (SELECT stratum, n_t, n_c, mean_t, mean_c,
           |             round(mean_t - mean_c, 6) AS diff FROM m),
           |t AS (SELECT sum(n_t) AS nt_tot FROM d),
           |att AS (SELECT round(CAST(sum(CAST(round(diff * n_t / nt_tot, 9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS att
           |        FROM d CROSS JOIN t WHERE diff IS NOT NULL)
           |SELECT stratum, n_t, n_c, mean_t, mean_c, diff, att.att
           |FROM d CROSS JOIN att ORDER BY stratum""".stripMargin),
    (s, d) => {
      val wk2 = lit("2024-01-08").cast("timestamp")
      val zero = lit(0).cast(Money)
      val u = events(s, d)
        .groupBy("user_id")
        .agg(
          lng(sum(when(col("event_type") === "error" && col("ts") < wk2, 1L)
            .otherwise(0L))).as("e1"),
          lng(sum(when(col("ts") < wk2, 1L).otherwise(0L))).as("a1"),
          sum(when(col("event_type") === "purchase" && col("ts") >= wk2,
            money(col("value"))).otherwise(zero)).as("y"))
      val su = u.select(
        least(lit(3L), expr("greatest(0, a1 - 12) div 3")).as("stratum"),
        (col("e1") >= 3).as("treated"), col("y"))
      val cell = su.groupBy("stratum")
        .agg(lng(sum(when(col("treated"), 1L).otherwise(0L))).as("n_t"),
          lng(sum(when(col("treated"), 0L).otherwise(1L))).as("n_c"),
          sum(when(col("treated"), col("y")).otherwise(zero)).as("sy_t"),
          sum(when(col("treated"), zero).otherwise(col("y"))).as("sy_c"))
      val dd = cell.select(col("stratum"), col("n_t"), col("n_c"),
          round(dbl(col("sy_t")) / nullif(col("n_t"), lit(0L)), 6).as("mean_t"),
          round(dbl(col("sy_c")) / nullif(col("n_c"), lit(0L)), 6).as("mean_c"))
        .withColumn("diff", round(col("mean_t") - col("mean_c"), 6))
        .persist()
      val t = dd.agg(sum("n_t").as("nt_tot"))
      val att = dd.crossJoin(broadcast(t))
        .filter(col("diff").isNotNull)
        .agg(round(dbl(sum(
          round(col("diff") * col("n_t") / col("nt_tot"), 9)
            .cast(DecimalType(28, 9)))), 6).as("att"))
      dd.crossJoin(broadcast(att))
        .select(col("stratum"), col("n_t"), col("n_c"), col("mean_t"),
          col("mean_c"), col("diff"), col("att"))
        .transform(materializeThenRelease(_, dd))
        .orderBy("stratum")
    }
  )

  /** Cumulative gains / lift by score decile — the TARGETING readout
    * next to q_auc (global ranking quality) and q_pr_curve
    * (threshold operating points): "if I act on the top k% by score,
    * what share of the positives do I capture, and at how many times
    * the base rate?" — the table every campaign/fraud/lead-scoring
    * deployment reads before picking a cutoff. Score = event value
    * (the shared proxy-score convention), positive = purchase; bins
    * are the shared 10 equal-width value bins scanned from the TOP.
    *
    * Determinism: bin counts are exact BIGINTs; cumulative counts
    * come from the bounded bins² self-join (the q_stump discipline —
    * no window); gain and lift are single divisions of exact BIGINTs
    * rounded 6 (lift = gain / (cum_n / N) algebraically rearranged to
    * cum_pos·N / (cum_n·P) — BIGINT products then ONE division).
    *
    * Scale: one map-side-combined fact pass to ≤ 10 bins; everything
    * downstream is bins-sized with a single-row broadcast.
    */
  private val lift = QueryDef(
    "q_lift",
    "Cumulative gains and lift by descending score bin (value bins, " +
      "positive = purchase): per bin the captured-positive share and " +
      "the lift over the base rate — the campaign-targeting readout.",
    Some("""WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
           |e AS (SELECT CASE WHEN hi = lo THEN 0
           |             ELSE greatest(0, least(9, CAST(floor((value - lo) / (hi - lo) * 10) AS BIGINT))) END AS bin,
           |             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           |      FROM events CROSS JOIN b),
           |cells AS (SELECT bin, CAST(sum(y) AS BIGINT) AS pos, CAST(count(*) AS BIGINT) AS n
           |          FROM e GROUP BY 1),
           |t AS (SELECT sum(pos) AS tp, sum(n) AS tn FROM cells),
           |cum AS (SELECT a.bin, sum(c.pos) AS cpos, sum(c.n) AS cn
           |        FROM cells a JOIN cells c ON c.bin >= a.bin GROUP BY 1)
           |SELECT c.bin, c.n, c.pos, CAST(u.cn AS BIGINT) AS cum_n,
           |       CAST(u.cpos AS BIGINT) AS cum_pos,
           |       round(CAST(u.cpos AS DOUBLE) / nullif(t.tp, 0), 6) AS gain,
           |       round(CAST(u.cpos * t.tn AS DOUBLE) / nullif(u.cn * t.tp, 0), 6) AS lift
           |FROM cells c JOIN cum u ON u.bin = c.bin CROSS JOIN t
           |ORDER BY c.bin DESC""".stripMargin),
    (s, d) => {
      val ev = events(s, d).select(col("value"), col("event_type"))
      val b = ev.agg(min("value").as("lo"), max("value").as("hi"))
      val cells = ev.crossJoin(broadcast(b))
        .select(when(col("hi") === col("lo"), lit(0L))
            .otherwise(greatest(lit(0L), least(lit(9L),
              floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 10)
                .cast("long")))).as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("bin")
        .agg(lng(sum(col("y"))).as("pos"), lng(count(lit(1))).as("n"))
        .persist()
      val t = cells.agg(sum("pos").as("tp"), sum("n").as("tn"))
      val cum = cells.as("a")
        .join(cells.select(col("bin").as("cb"), col("pos").as("cp"),
          col("n").as("cn0")).as("c"), col("cb") >= col("a.bin"))
        .groupBy(col("a.bin").as("bin"))
        .agg(sum(col("cp")).as("cpos"), sum(col("cn0")).as("cn"))
      cells.join(broadcast(cum), "bin")
        .crossJoin(broadcast(t))
        .select(col("bin"), col("n"), col("pos"), lng(col("cn")).as("cum_n"),
          lng(col("cpos")).as("cum_pos"),
          // nullif guard (ADVICE r12): tp = 0 when no purchases exist —
          // both engines must agree NULL rather than diverge on inf/NaN
          round(dbl(col("cpos")) / nullif(col("tp"), lit(0L)), 6).as("gain"),
          round(dbl(col("cpos") * col("tn"))
            / nullif(col("cn") * col("tp"), lit(0L)), 6).as("lift"))
        .transform(materializeThenRelease(_, cells))
        .orderBy(col("bin").desc)
    }
  )

  /** Brier score with the Murphy decomposition — the PROPER-SCORING
    * readout next to q_calibration (reliability bins), q_isotonic (the
    * recalibration fix) and q_auc (ranking): brier = mean squared
    * error of the probabilistic forecast, split into reliability (how
    * far bin forecasts sit from bin outcomes — what isotonic removes),
    * resolution (how much the bins separate the base rate — what no
    * recalibration can add) and uncertainty (the base-rate floor).
    * Forecast = the fractional-cents pseudo-probability k/100 with
    * k = floor(value·100) mod 100 (integer-derived, exactly 2
    * decimals); outcome = click among click/view; bins = forecast
    * deciles k div 10.
    *
    * Determinism: the per-row squared error is PURE BIGINT —
    * (k − 100y)² — so the headline brier is an exact integer sum with
    * one final double division; the k→bin map is integer. The bin
    * terms of reliability/resolution are shared double chains over
    * exact per-bin BIGINTs (d cast first, one multiply order), rounded
    * 9 and summed as DECIMAL(28,9) (order-free over ≤ 10 bins, the
    * q_propensity att discipline), then ONE division by N.
    *
    * Scale: one map-side-combined fact pass to ≤ 10 bin cells;
    * everything downstream is bins-sized with single-row broadcasts —
    * no shuffle grows with the fact table.
    */
  private val brier = QueryDef(
    "q_brier",
    "Brier score + Murphy decomposition (reliability / resolution / " +
      "uncertainty) of the fractional-cents forecast for click-vs-" +
      "view, over forecast deciles: the proper-scoring-rule readout " +
      "that says whether a score needs recalibration (reliability) " +
      "or simply cannot separate (resolution).",
    Some("""WITH e AS (SELECT CAST(floor(value * 100) AS BIGINT) % 100 AS k,
           |                  CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS y
           |           FROM events WHERE event_type IN ('click', 'view')),
           |cells AS (SELECT k // 10 AS bin, CAST(count(*) AS BIGINT) AS n,
           |                 CAST(sum(k) AS BIGINT) AS sp, CAST(sum(y) AS BIGINT) AS sy,
           |                 CAST(sum((k - 100 * y) * (k - 100 * y)) AS BIGINT) AS ssq
           |          FROM e GROUP BY 1),
           |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sy) AS BIGINT) AS ty,
           |             CAST(sum(ssq) AS BIGINT) AS tssq
           |      FROM cells),
           |terms AS (SELECT
           |    round(CAST(sp - 100 * sy AS DOUBLE) * CAST(sp - 100 * sy AS DOUBLE)
           |          / (10000.0 * CAST(n AS DOUBLE)), 9) AS rel_t,
           |    round(CAST(n AS DOUBLE)
           |          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - CAST(ty AS DOUBLE) / CAST(nn AS DOUBLE))
           |          * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) - CAST(ty AS DOUBLE) / CAST(nn AS DOUBLE)), 9) AS res_t
           |  FROM cells CROSS JOIN t)
           |SELECT t.nn AS n,
           |       round(CAST(t.tssq AS DOUBLE) / (10000.0 * CAST(t.nn AS DOUBLE)), 6) AS brier,
           |       round(CAST(sum(CAST(rel_t AS DECIMAL(28,9))) AS DOUBLE) / CAST(t.nn AS DOUBLE), 6) AS reliability,
           |       round(CAST(sum(CAST(res_t AS DECIMAL(28,9))) AS DOUBLE) / CAST(t.nn AS DOUBLE), 6) AS resolution,
           |       round(CAST(t.ty AS DOUBLE) / CAST(t.nn AS DOUBLE)
           |             * (1.0 - CAST(t.ty AS DOUBLE) / CAST(t.nn AS DOUBLE)), 6) AS uncertainty
           |FROM terms CROSS JOIN t GROUP BY t.nn, t.ty, t.tssq""".stripMargin),
    (s, d) => {
      val e = events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select(expr("CAST(floor(value * 100) AS BIGINT) % 100").as("k"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("y"))
      val cells = e.groupBy(expr("k div 10").as("bin"))
        .agg(lng(count(lit(1))).as("n"), lng(sum("k")).as("sp"),
          lng(sum("y")).as("sy"),
          lng(sum(expr("(k - 100 * y) * (k - 100 * y)"))).as("ssq"))
        .persist()
      val t = cells.agg(lng(sum("n")).as("nn"), lng(sum("sy")).as("ty"),
        lng(sum("ssq")).as("tssq"))
      val terms = cells.crossJoin(broadcast(t)).select(
        round(dbl(col("sp") - lit(100L) * col("sy"))
          * dbl(col("sp") - lit(100L) * col("sy"))
          / (lit(10000.0) * dbl(col("n"))), 9).as("rel_t"),
        round(dbl(col("n"))
          * (dbl(col("sy")) / dbl(col("n")) - dbl(col("ty")) / dbl(col("nn")))
          * (dbl(col("sy")) / dbl(col("n")) - dbl(col("ty")) / dbl(col("nn"))),
          9).as("res_t"),
        col("nn"), col("ty"), col("tssq"))
      terms.groupBy("nn", "ty", "tssq")
        .agg(
          round(dbl(sum(col("rel_t").cast(DecimalType(28, 9)))) / dbl(col("nn")), 6)
            .as("reliability"),
          round(dbl(sum(col("res_t").cast(DecimalType(28, 9)))) / dbl(col("nn")), 6)
            .as("resolution"))
        .select(col("nn").as("n"),
          round(dbl(col("tssq")) / (lit(10000.0) * dbl(col("nn"))), 6).as("brier"),
          col("reliability"), col("resolution"),
          round(dbl(col("ty")) / dbl(col("nn"))
            * (lit(1.0) - dbl(col("ty")) / dbl(col("nn"))), 6).as("uncertainty"))
        .transform(materializeThenRelease(_, cells))
    }
  )

  val defs: Seq[QueryDef] =
    Seq(dpCount, bootstrapCi, ksTest, calibration, regression, auc, prCurve,
      psi, conformal, isotonic, propensity, lift, brier)
}
