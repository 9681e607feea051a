package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * `Column.expr` behind org.apache.spark.sql.classic.ExpressionUtils).
  * Standard extension-library pattern: one tiny file living in the
  * org.apache.spark.sql package, everything else stays in graft.*. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Stable per-session identifier (private[sql] in Spark 4) — used as a
    * cache key that survives GC, unlike identityHashCode. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID

  /** Apply an extensions object's injected functions to an already-built
    * session (getOrCreate ignores withExtensions when a session exists —
    * e.g. shared test sessions). */
  def applyExtensions(spark: SparkSession,
      ext: SparkSessionExtensions => Unit): Unit = {
    val e = new SparkSessionExtensions
    ext(e)
    e.registerFunctions(spark.sessionState.functionRegistry)
  }
}
