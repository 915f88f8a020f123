package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity of two strings.
  *
  * Spark ships levenshtein but no Jaro-Winkler, and the fuzzy-matching
  * stage of entity resolution wants the length-normalized, prefix-boosted
  * score (edit distance punishes long strings uniformly; JW rewards the
  * shared-prefix shape real-world name corruptions preserve). Same
  * escalation rationale as [[ShingleHashes]]: a per-row double loop has
  * no builtin composition, a Scala UDF would box both strings per call
  * and fall out of whole-stage codegen, so it becomes a BinaryExpression
  * with a static `compute` twin callable from generated code.
  *
  * DEFINITION PARITY (the contract that makes the DuckDB oracle twin
  * byte-comparable): this is the classic Jaro similarity — match window
  * floor(max(l1,l2)/2) − 1, transpositions = half the out-of-order
  * matched pairs — with the Winkler prefix boost j + 0.1·p·(1−j), p =
  * shared prefix capped at 4, applied ONLY when jaro > 0.7 (the boost
  * threshold). Verified bit-identical to DuckDB v1.0's
  * `jaro_winkler_similarity` over 3000 random-string probes including
  * boost-threshold boundary cases (round-13 notes, PLANS.md); the fixed
  * left-associated IEEE order below — (m/l1 + m/l2 + (m−t)/m)/3, then
  * (0.1·p)·(1−j) — is part of that parity and must not be re-associated.
  *
  * Characters are UTF-16 code units (the corpus is ASCII name soup —
  * TESTDATA.md), matching DuckDB's per-codepoint walk on the BMP.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Tight-loop kernel; called from generated code — must stay a pure
    * static function of its arguments.
    */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(l1, l2) / 2 - 1
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - md)
      val hi = math.min(i + md + 1, l2)
      var done = false
      while (j < hi && !done) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // fixed left-associated IEEE order — part of the DuckDB parity contract
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j <= 0.7) return j
    var p = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
    j + 0.1 * p * (1.0 - j)
  }

  /** Column wrapper. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnShim.column(JaroWinkler(ColumnShim.expression(a), ColumnShim.expression(b)))
}
