package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static implementation the generated code calls. One in-row pass:
  * polynomial k-gram hashes, monotonic-deque sliding-window minimum
  * (ties → rightmost, the `min(struct(h, -pos))` rule), per-document
  * DISTINCT selected fingerprints in first-selection order. */
object WinnowSelectImpl {
  /** Exactly reproduces the SQL chain it replaces (q297):
    *   h(i)   = fold over vals[i..i+k-1] of (acc*31 + x) % 2147483647,
    *            acc0 = 7, 1-based i in [1, n-k+1]
    *   window = [pos, pos+w-1] over h, pos in [1, n-(k+w-2)]
    *   select = min h in window, rightmost position on ties
    *   output = distinct selected h per row
    * All arithmetic is nonnegative-Long (x < 2^48, acc < 2^31, so
    * acc*31 + x < 2^63 — no overflow, same values as the SQL fold). */
  def select(vals: ArrayData, k: Int, w: Int): ArrayData = {
    val n = vals.numElements()
    val m = n - k + 1                 // number of k-grams
    val nWin = m - w + 1              // number of windows
    if (nWin <= 0) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = 7L
      var j = 0
      while (j < k) {
        acc = (acc * 31L + vals.getLong(i + j)) % 2147483647L
        j += 1
      }
      h(i) = acc
      i += 1
    }
    // monotonic deque of indices; back-pop on >= so the RIGHTMOST of
    // equal minima survives (the -pos tiebreak of the window form)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < m) {
      while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
      deque(tail) = i; tail += 1
      val start = i - w + 1 // window [start, i]
      if (start >= 0) {
        while (deque(head) < start) head += 1
        if (start < nWin) seen.add(h(deque(head)))
      }
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken 2003) as
  * a native Catalyst expression — round-16 optimization of q297. The
  * SQL spelling it replaces exploded every k-gram position to a row
  * (corpus-token-scale), shuffled on doc_id and ran a sliding-window
  * min — one full shuffle + sort whose only purpose was a per-document
  * O(n) scan. Higher-order-function folds are also interpreted
  * (CodegenFallback), so the k-gram hashing paid interpreter overhead
  * per element. This expression does the whole selection in one
  * in-row compiled pass (hashes + monotonic-deque window min + per-doc
  * distinct), so the query's first shuffle is the fingerprint posting
  * aggregate itself — at 100 TB that removes a corpus-size exchange
  * outright (guide §2.4). Value-identical by construction: same fold
  * arithmetic, same rightmost-tie rule, same distinct set (pinned by
  * Round16Spec against the SQL spelling). */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_select needs array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def nullSafeEval(v: Any): Any =
    WinnowSelectImpl.select(v.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.plans.WinnowSelectImpl.select($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  /** DataFrame-API binding. */
  def col(c: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowSelect(GraftBridge.expression(c), k, w))
}
