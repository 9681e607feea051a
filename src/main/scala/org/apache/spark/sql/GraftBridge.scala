package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * `Column.expr` behind org.apache.spark.sql.classic.ExpressionUtils).
  * Standard extension-library pattern: one tiny file living in the
  * org.apache.spark.sql package, everything else stays in graft.*. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager Column→Expression conversion. `expression` wraps the column
    * in a LAZY ColumnNodeExpression that only the DataFrame analysis
    * path unwraps — an expression returned from an injected SQL function
    * builder is already "resolved" from the analyzer's point of view and
    * the wrapper survives to codegen, which throws. This converter
    * produces the real catalyst tree (any UnresolvedFunction children
    * are ordinary unresolved nodes the analyzer then resolves). */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Stable per-session identifier (private[sql] in Spark 4) — used as a
    * cache key that survives GC, unlike identityHashCode. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** Uncorrelated scalar subquery over a one-row/one-column frame. Spark
    * plans it as its own job and embeds the result — the supported way
    * to feed a computed scalar (e.g. an aggregated bloom filter) into an
    * expression without a driver-side collect. */
  def scalarSubquery(df: Dataset[_]): Expression =
    catalyst.expressions.ScalarSubquery(df.queryExecution.analyzed)

  /** Append an optimizer rule to an already-built session (the
    * extraOptimizations batch runs after the main optimizer). Idempotent. */
  def installOptimizerRule(spark: SparkSession,
      rule: Rule[LogicalPlan]): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraOptimizations.contains(rule))
      cs.experimental.extraOptimizations =
        cs.experimental.extraOptimizations :+ rule
  }

  /** Wrap a logical plan as a DataFrame (Dataset.ofRows is
    * private[sql]) — the entry point for custom LogicalPlan nodes. */
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Append a planner strategy to an already-built session. Idempotent. */
  def installStrategy(spark: SparkSession,
      st: execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(st))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ st
  }

  /** Apply an extensions object's injected scalar AND table functions
    * to an already-built session (getOrCreate ignores withExtensions
    * when a session exists — e.g. shared test sessions). */
  def applyExtensions(spark: SparkSession,
      ext: SparkSessionExtensions => Unit): Unit = {
    val e = new SparkSessionExtensions
    ext(e)
    e.registerFunctions(spark.sessionState.functionRegistry)
    e.registerTableFunctions(spark.sessionState.tableFunctionRegistry)
  }
}
