package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression,
  Greatest, GreaterThan, GreaterThanOrEqual, Least, Length, LessThan,
  LessThanOrEqual, Literal, Multiply, PredicateHelper, Round}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DecimalType, DoubleType}

import graft.functions.JaroWinkler

/** Optimizer rule: inject a provable length-ratio prefilter under
  * high-threshold Jaro-Winkler predicates.
  *
  * THE BOUND. With r = min(l1,l2)/max(l1,l2): matches are capped by the
  * shorter string (m ≤ lmin), so jaro ≤ (lmin/lmax + 1 + 1)/3 = (r+2)/3,
  * and the Winkler boost is capped by p ≤ 4: jw ≤ j + 0.4(1−j) =
  * 0.4 + 0.6j ≤ 0.4 + 0.2(r+2) = 0.8 + 0.2r. Therefore
  *
  *     jw(a,b) ≥ c  ⟹  min(len)/max(len) ≥ 5c − 4,
  *
  * which is non-vacuous exactly when c > 0.8 — the regime every
  * entity-resolution threshold lives in. The injected guard
  * `least(len) ≥ (5c−4−1e-9)·greatest(len)` is sound (the 1e-9 slack
  * over-covers the double representation of 5c−4) and costs two string
  * lengths against the O(len²) match-window loop it short-circuits:
  * under an And, Spark evaluates left-to-right, so length-mismatched
  * candidate pairs never reach the JW kernel. JwPrefilterSpec pins
  * soundness (brute force over random pairs), plan injection, and
  * rule-on == rule-off rows.
  *
  * Matched shapes: `jw ≥ c`, `jw > c`, their flipped forms, and
  * `round(jw, p) ≥/> c` (a rounded value ≥ c only if the raw value ≥
  * c − 10^-p, so the threshold relaxes by one full grid step — still
  * sound). Idempotent under the fixed-point optimizer: a conjunct
  * semantically equal to the guard suppresses re-injection.
  *
  * Registration: injected by [[graft.functions.GraftSparkExtensions]]
  * for platform-owned sessions, and installed idempotently into
  * `spark.experimental.extraOptimizations` by [[install]] for sessions
  * the driver already built (the Verify/Bench path).
  */
object JaroWinklerPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  /** Sound double-space relaxation of the 5c−4 ratio bound. */
  private def ratioBound(c: Double): Double = 5.0 * c - 4.0 - 1e-9

  private def guard(a: Expression, b: Expression, c: Double): Expression = {
    val la = Cast(Length(a), DoubleType)
    val lb = Cast(Length(b), DoubleType)
    GreaterThanOrEqual(Least(Seq(la, lb)),
      Multiply(Literal(ratioBound(c)), Greatest(Seq(la, lb))))
  }

  /** Extract (a, b, effective threshold) from a JW-threshold conjunct.
    *
    * SQL-text entry points parse `0.9` as DECIMAL(1,1); type coercion
    * then rewrites the comparison with casts around the JW side and/or
    * leaves a decimal literal. Both are handled: a decimal literal is
    * converted via toDouble, a lossless Cast-to-double around the JW
    * child is unwrapped, and a Cast to DECIMAL(_, s) (which rounds to s
    * decimals) relaxes the threshold by one 10^-s grid step — the same
    * sound full-grid-slack argument as `round`.
    */
  private def jwThreshold(e: Expression): Option[(Expression, Expression, Double)] = {
    def unwrapCasts(r: Expression): (Expression, Double => Double) = r match {
      case c: Cast if c.dataType == DoubleType =>
        unwrapCasts(c.child)
      case c: Cast => c.dataType match {
        case dt: DecimalType =>
          val (inner, f) = unwrapCasts(c.child)
          (inner, (x: Double) => f(x) - math.pow(10.0, -dt.scale))
        case _ => (r, identity)
      }
      case other => (other, identity)
    }
    def viaRound(r0: Expression): Option[(Expression, Expression, Double => Double)] = {
      val (r, castSlack) = unwrapCasts(r0)
      r match {
        case JaroWinkler(a, b) => Some((a, b, castSlack))
        case rd: Round => unwrapCasts(rd.child)._1 match {
          case JaroWinkler(a, b) => rd.scale match {
            case Literal(p: Int, _) =>
              // round(jw, p) ≥ c only if jw ≥ c − 10^-p (full-grid slack)
              Some((a, b, (c: Double) => castSlack(c) - math.pow(10.0, -p)))
            case _ => None
          }
          case _ => None
        }
        case _ => None
      }
    }
    def thresholdLit(l: Expression): Option[Double] = l match {
      case Literal(c: Double, DoubleType) => Some(c)
      case Literal(d: Decimal, _: DecimalType) => Some(d.toDouble)
      case _ => None
    }
    e match {
      case GreaterThanOrEqual(l, r) => thresholdLit(r).flatMap(c =>
        viaRound(l).map { case (a, b, f) => (a, b, f(c)) })
      case GreaterThan(l, r) => thresholdLit(r).flatMap(c =>
        viaRound(l).map { case (a, b, f) => (a, b, f(c)) })
      case LessThanOrEqual(l, r) => thresholdLit(l).flatMap(c =>
        viaRound(r).map { case (a, b, f) => (a, b, f(c)) })
      case LessThan(l, r) => thresholdLit(l).flatMap(c =>
        viaRound(r).map { case (a, b, f) => (a, b, f(c)) })
      case _ => None
    }
  }

  /** And-prepend any derivable guards onto `cond`; None if nothing new. */
  private def guarded(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(jwThreshold).collect {
      case (a, b, c) if ratioBound(c) > 0.0 => guard(a, b, c)
    }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    // guard first: under And, short-circuit skips the JW loop
    if (guards.isEmpty) None else Some(And(guards.reduce(And), cond))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, _) =>
      guarded(cond).map(c => f.copy(condition = c)).getOrElse(f)
    // PushPredicateThroughJoin routinely moves the JW threshold into the
    // join condition before this rule runs — guard it there too
    case j: Join if j.condition.isDefined =>
      guarded(j.condition.get).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  /** Idempotently install into an existing session's experimental
    * optimizations (the path for driver-owned sessions, where
    * spark.sql.extensions cannot be set post-creation).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
