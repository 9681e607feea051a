package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Longest-common-subsequence length over two token arrays — the q316
  * ROUGE-L kernel. The declarative formulation (nested `aggregate`
  * folds carrying the DP row) is semantically right but COPIES the row
  * array on every cell append through interpreted lambda machinery —
  * O(n·m²) allocations per pair, measured 107 s for the sf0.1 pair set.
  * This expression runs the identical two-row DP as a tight primitive
  * loop over reused int buffers (O(n·m) cell ops, zero allocation
  * beyond the two rows), with `doGenCode` keeping it inside
  * whole-stage codegen. Same (b)-tier custom-Expression rationale as
  * DotProduct: the built-ins compose the semantics, not the
  * performance. Round11Spec's hand-traced fixture and the q316 oracle
  * (which replays the textbook recurrence cell-for-cell in a recursive
  * CTE) pin that expression ≡ fold ≡ recurrence. */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStringArray(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isStringArray(left.dataType) && isStringArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_length needs array<string> inputs, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_length"

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.LcsLength.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  /** Two-row LCS DP; null elements never match anything (the token
    * arrays are built from split(), which yields no nulls). */
  def compute(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    val m = y.numElements()
    if (n == 0 || m == 0) return 0L
    val ys = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var j = 0
    while (j < m) { ys(j) = y.getUTF8String(j); j += 1 }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val xi = x.getUTF8String(i)
      j = 0
      while (j < m) {
        cur(j + 1) =
          if (xi != null && xi.equals(ys(j))) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m).toLong
  }

  def col(a: Column, b: Column): Column =
    GraftBridge.column(LcsLength(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
