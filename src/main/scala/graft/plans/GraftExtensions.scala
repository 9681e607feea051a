package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: installs the engine's native
  * functions into every session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the standard way
  * to ship a function library with zero per-session registration code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      (exprs: Seq[Expression]) => L2Norm(exprs.head)))
    // Filter(row_number <= k) over Window → bounded-heap aggregate
    ext.injectOptimizerRule(_ => TopKWindowRule)
  }
}
