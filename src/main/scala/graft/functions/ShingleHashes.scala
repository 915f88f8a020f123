package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: sorted distinct polynomial hashes of all
  * word n-gram shingles of a document.
  *
  * Semantically identical to the HOF composition in
  * [[graft.ops.TextAnalysis.shinglesSpark]] —
  * `array_sort(array_distinct(transform(sequence(0, size(ws)-n), i ->
  * aggregate(split(concat_ws(' ', ws[i..i+n-1]), ''), 0L,
  * (h,c) -> (h*31 + ascii(c)) % P))))` — and bit-identical to the DuckDB
  * oracle twin [[graft.ops.TextAnalysis.shinglesDuck]] (same left fold,
  * `h ← (h·31 + char) mod 1e9+7`, ' ' = 32 between words).
  *
  * Why a custom expression (SURVEY.md §4.2 escalation path): Spark
  * evaluates lambda-function HOFs interpreted, with per-element boxing —
  * the nested per-character fold costs ~µs/char and dominated the dedup
  * family at bench scale. This expression runs the same arithmetic as one
  * tight JVM loop and participates in whole-stage codegen via a static
  * call (`defineCodeGen`), so the scan→shingle→explode pipeline stays in
  * a single generated stage. At 100 TB the hash work is embarrassingly
  * parallel per-row scan work — no dictionary, no shuffle, no driver
  * state — so the single-node speedup translates directly.
  *
  * ASCII contract: the fold consumes UTF-16 code units, matching
  * `split(text, '')` + `ascii()` on the BMP; the corpus is ASCII word
  * soup (TESTDATA.md). Documents with fewer than n words yield an empty
  * array (the HOF form would error on a negative sequence bound).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(ws: Any): Any =
    ShingleHashes.compute(ws.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Hash modulus — must equal [[graft.ops.TextAnalysis.P]]. */
  val P = 1000000007L

  /** Tight-loop twin of the interpreted HOF fold. Called from generated
    * code, so it must stay a pure static function of its arguments.
    */
  def compute(ws: ArrayData, n: Int): ArrayData = {
    val m = ws.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var h = 0L
      var k = 0
      while (k < n) {
        if (k > 0) h = (h * 31 + 32L) % P // ' ' joiner, as in concat_ws
        val w = ws.getUTF8String(i + k).toString
        var ci = 0
        val len = w.length
        while (ci < len) {
          h = (h * 31 + w.charAt(ci)) % P
          ci += 1
        }
        k += 1
      }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var wr = 0
    var rd = 1
    while (rd < cnt) {
      if (out(rd) != out(wr)) { wr += 1; out(wr) = out(rd) }
      rd += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, wr + 1))
  }
}

/** Registration surface for graft's native functions: a per-session
  * idempotent `register` for locally-built sessions, plus a
  * [[SparkSessionExtensions]] injector
  * (`spark.sql.extensions=graft.functions.GraftSparkExtensions`) for
  * cluster deployments where the session is built by the platform.
  */
object GraftFunctions {
  private val shingleInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "shingle_hashes")

  private val shingleBuilder: Seq[Expression] => Expression = {
    case Seq(ws, Literal(n: Int, IntegerType)) => ShingleHashes(ws, n)
    case other => throw new IllegalArgumentException(
      s"shingle_hashes(array<string>, int literal), got $other")
  }

  val shingleIdent: FunctionIdentifier = FunctionIdentifier("shingle_hashes")

  /** Column-level builder (no SQL registration needed). */
  def shingleHashes(ws: Column, n: Int): Column =
    ColumnShim.column(ShingleHashes(ColumnShim.expression(ws), n))

  /** Idempotently register graft functions in an existing session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(shingleIdent)) {
      reg.registerFunction(shingleIdent, shingleInfo, shingleBuilder)
    }
  }
}

class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((GraftFunctions.shingleIdent,
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      { exprs: Seq[Expression] =>
        exprs match {
          case Seq(ws, Literal(n: Int, IntegerType)) => ShingleHashes(ws, n)
          case other => throw new IllegalArgumentException(
            s"shingle_hashes(array<string>, int literal), got $other")
        }
      }))
    // length-ratio prefilter under high-threshold Jaro-Winkler predicates
    ext.injectOptimizerRule(_ => graft.plans.JaroWinklerPrefilter)
  }
}
