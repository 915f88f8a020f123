package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native per-row sketch signatures over a shingle-hash array.
  *
  * Both MinHash and SimHash signatures are pure per-row functions of the
  * (sorted distinct) shingle array, built from order-independent
  * combiners (min / integer sum). The first implementation computed them
  * as `explode(sh)` → 16/32 codegen'd aggregates → exchange by doc_id —
  * correct, but it forces a shuffle of the whole shingle stream purely
  * to regroup what was already grouped. These expressions compute the
  * identical values in one pass over the array inside the scan stage:
  * zero exchanges until the LSH band join, which is the first operation
  * that genuinely needs data movement. At 100 TB that removes the
  * largest shuffle of the dedup pipeline.
  *
  * Arithmetic is bit-identical to the DuckDB oracle twins
  * (DedupQueries.sigsDuck / simhashDuck): permutation j of MinHash maps
  * h ↦ (h·a_j + j·40503) mod P with a_j = ((j+1)·2654435761) mod P;
  * SimHash bit j is the sign of Σ_h ±1 with parity of
  * ((h·(2j+3) + j) mod P). All intermediates stay inside signed 64-bit
  * (h < P = 1e9+7, a_j < P ⇒ h·a_j < ~1e18).
  */
object SketchExprs {
  val P: Long = 1000000007L

  def minhash(sh: ArrayData, nPerms: Int): ArrayData = {
    val n = sh.numElements()
    val out = new Array[Long](nPerms)
    var j = 0
    while (j < nPerms) {
      val aj = ((j + 1L) * 2654435761L) % P
      val bj = j * 40503L
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (sh.getLong(i) * aj + bj) % P
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def simhash(sh: ArrayData): Long = {
    val n = sh.numElements()
    var sig = 0L
    var j = 0
    while (j < 32) {
      var s = 0L
      var i = 0
      while (i < n) {
        val h = sh.getLong(i)
        s += (if (((h * (2L * j + 3) + j) % P) % 2 == 1) 1 else -1)
        i += 1
      }
      sig = sig * 2 + (if (s > 0) 1L else 0L)
      j += 1
    }
    sig
  }
}

sealed trait ShingleArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.simpleString}")
  }
}

/** MinHash signature: `nPerms` permutation minima over the shingle
  * array. Empty input yields `Long.MaxValue` minima — never produced by
  * the pipeline, which filters empty shingle sets first.
  */
case class MinHashSigs(child: Expression, nPerms: Int)
    extends UnaryExpression with ShingleArrayInput {
  require(nPerms >= 1 && nPerms <= 1024)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"
  override def nullSafeEval(sh: Any): Any =
    SketchExprs.minhash(sh.asInstanceOf[ArrayData], nPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchExprs.minhash($c, $nPerms)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** 32-bit SimHash signature packed MSB-first into a long. */
case class SimHashSig(child: Expression)
    extends UnaryExpression with ShingleArrayInput {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_sig"
  override def nullSafeEval(sh: Any): Any =
    SketchExprs.simhash(sh.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchExprs.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SketchFunctions {
  def minHashSigs(sh: Column, nPerms: Int): Column =
    ColumnShim.column(MinHashSigs(ColumnShim.expression(sh), nPerms))
  def simHashSig(sh: Column): Column =
    ColumnShim.column(SimHashSig(ColumnShim.expression(sh)))
}
