package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector / set hot loops
  * (SURVEY.md §4.2's deferred escalation path, promoted after BENCH
  * showed the interpreted-HOF folds dominating the dedup/ANN family).
  *
  * Every expression reproduces, arithmetic step for arithmetic step, the
  * HOF composition it replaces (kept in [[graft.util.Det]] as `*Hof`
  * for the equivalence specs): sequential fold in array order, floats
  * widened to double *before* multiplication — so results are
  * bit-identical to both the HOF form and the DuckDB oracle twins.
  *
  * All participate in whole-stage codegen via static calls
  * (`defineCodeGen`), keeping scan → score → filter in one generated
  * stage; at cluster scale they are pure per-row scan work.
  */
object VectorExprs {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += elem(a, i, af) * elem(b, i, bf); i += 1 }
    s
  }

  def l2sq(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = elem(a, i, af) - elem(b, i, bf)
      s += d * d
      i += 1
    }
    s
  }

  def norm2(a: ArrayData, af: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = elem(a, i, af); s += x * x; i += 1 }
    s
  }

  /** Count of common elements between two sorted-distinct long arrays
    * (single merge scan). Equals `size(array_intersect(a, b))` and the
    * inverted-index `count(*)` group the oracle computes.
    */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Random-hyperplane LSH band keys, AND-OR scheme. For band group g of
    * `groups`, plane p of `bits`: plane j = g·bits + p has components
    * w(j,i) = ((j·dimStride + i)·2654435761 mod 97) − 48; the key packs
    * the `bits` sign bits MSB-first and offsets by group:
    * key_g = g·2^bits + Σ_p sign(e·plane_{g·bits+p})·2^(bits−1−p).
    * Deterministic pseudo-random planes — both engines recompute them
    * from the index arithmetic alone.
    */
  def hyperplaneKeys(e: ArrayData, ef: Boolean, groups: Int, bits: Int,
      dimStride: Int): ArrayData = {
    val dim = e.numElements()
    val keys = new Array[Long](groups)
    var g = 0
    while (g < groups) {
      var packed = 0L
      var p = 0
      while (p < bits) {
        val j = g * bits + p
        var s = 0.0
        var i = 0
        while (i < dim) {
          val w = ((j.toLong * dimStride + i) * 2654435761L) % 97L - 48L
          s += elem(e, i, ef) * w
          i += 1
        }
        packed = packed * 2 + (if (s > 0) 1L else 0L)
        p += 1
      }
      keys(g) = g.toLong * (1L << bits) + packed
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }
}

sealed trait VecArrayTypes { self: Expression =>
  protected def checkVec(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<float|double>, got ${other.simpleString}")
  }
  protected def isFloat(dt: DataType): Boolean =
    dt.asInstanceOf[ArrayType].elementType == FloatType
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayTypes {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVec(right.dataType, "right")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprs.dot($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class L2SqDistance(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayTypes {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVec(right.dataType, "right")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_l2sq"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprs.l2sq($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqDistance =
    copy(left = l, right = r)
}

case class VecNorm2(child: Expression)
    extends UnaryExpression with VecArrayTypes {
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "input")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_norm2"
  override def nullSafeEval(a: Any): Any =
    VectorExprs.norm2(a.asInstanceOf[ArrayData], isFloat(child.dataType))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorExprs.norm2($a, ${isFloat(child.dataType)})")
  override protected def withNewChildInternal(newChild: Expression): VecNorm2 =
    copy(child = newChild)
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  private def checkSide(dt: DataType, side: String): TypeCheckResult = dt match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$side must be array<bigint>, got ${other.simpleString}")
  }
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkSide(left.dataType, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkSide(right.dataType, "right")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorExprs.intersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

case class HyperplaneLshKeys(child: Expression, groups: Int, bits: Int,
    dimStride: Int) extends UnaryExpression with VecArrayTypes {
  require(groups >= 1 && bits >= 1 && bits <= 62 && dimStride >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "input")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_lsh_keys"
  override def nullSafeEval(a: Any): Any =
    VectorExprs.hyperplaneKeys(a.asInstanceOf[ArrayData],
      isFloat(child.dataType), groups, bits, dimStride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorExprs.hyperplaneKeys($a, ${isFloat(child.dataType)}, $groups, $bits, $dimStride)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshKeys =
    copy(child = newChild)
}

/** Column-level builders. */
object VectorFunctions {
  def vecDot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))
  def vecL2Sq(a: Column, b: Column): Column =
    ColumnShim.column(L2SqDistance(ColumnShim.expression(a), ColumnShim.expression(b)))
  def vecNorm2(a: Column): Column =
    ColumnShim.column(VecNorm2(ColumnShim.expression(a)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnShim.column(SortedIntersectCount(ColumnShim.expression(a), ColumnShim.expression(b)))
  def hyperplaneLshKeys(e: Column, groups: Int, bits: Int, dimStride: Int): Column =
    ColumnShim.column(HyperplaneLshKeys(ColumnShim.expression(e), groups, bits, dimStride))
}
