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

  /** Lift a Column→Column engine function into a SQL function builder:
    * the child expressions round-trip through Column, so whatever
    * expression tree the function composes (native ops, InSet, UDF) is
    * what SQL callers get — identical plans to the DataFrame API. */
  private def colFn(f: Seq[org.apache.spark.sql.Column] =>
      org.apache.spark.sql.Column): Seq[Expression] => Expression =
    exprs => org.apache.spark.sql.GraftBridge.resolvedExpression(
      f(exprs.map(org.apache.spark.sql.GraftBridge.column)))

  private def reg(ext: SparkSessionExtensions, name: String,
      f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      colFn(f)))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      (exprs: Seq[Expression]) => L2Norm(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"), // same name as DuckDB's
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    // The text/enrichment surface, SQL-callable with the same plans as
    // the DataFrame API (clean_text composes native regexp ops; the only
    // UDF-backed entries are the rule engines, demojize + vader).
    reg(ext, "clean_text", cs => graft.functions.TextOps.cleanText(cs.head))
    reg(ext, "gr_tokenize", cs => graft.functions.TextOps.tokenize(cs.head))
    reg(ext, "drop_stopwords",
      cs => graft.functions.TextOps.dropStopwords(cs.head))
    reg(ext, "hashtags", cs => graft.functions.TextOps.hashtags(cs.head))
    reg(ext, "adjacent_bigrams",
      cs => graft.functions.TextOps.adjacentBigrams(cs.head))
    reg(ext, "demojize", cs => graft.functions.Emoji.demojizeCol(cs.head))
    reg(ext, "vader", cs => graft.functions.SentimentOps.vader(cs.head))
    reg(ext, "tf_keywords",
      cs => graft.functions.Summarize.keywordsCol(cs.head))
    reg(ext, "media_kind", cs => graft.functions.Multimodal.mediaKind(cs.head))
    reg(ext, "canonical_url",
      cs => graft.operators.UrlQueries.canonicalUrl(cs.head))
    // cms_sketch(col, depth, width): count-min sketch aggregate; depth
    // and width must be foldable ints (they size the state buffer)
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CountMinSketchAgg].getName, "cms_sketch"),
      (exprs: Seq[Expression]) => {
        def intArg(e: Expression, what: String): Int = e.eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"cms_sketch: $what must be an integer literal, got $other")
        }
        CountMinSketchAgg(exprs(0),
          intArg(exprs(1), "depth"), intArg(exprs(2), "width"))
          .toAggregateExpression()
      }))
    // mg_sketch(term, k): Misra–Gries heavy-hitters aggregate; k must
    // be a foldable int (it bounds the counter state)
    ext.injectFunction((
      FunctionIdentifier("mg_sketch"),
      new ExpressionInfo(classOf[MgSketchAgg].getName, "mg_sketch"),
      (exprs: Seq[Expression]) =>
        MgSketchAgg(exprs(0), exprs(1)).toAggregateExpression()))
    // bitmap_agg(id): exact dense-id bitset aggregate
    ext.injectFunction((
      FunctionIdentifier("bitmap_agg"),
      new ExpressionInfo(classOf[BitmapAgg].getName, "bitmap_agg"),
      (exprs: Seq[Expression]) =>
        BitmapAgg(exprs.head).toAggregateExpression()))
    // Filter(row_number <= k) over Window → bounded-heap aggregate
    ext.injectOptimizerRule(_ => TopKWindowRule)
    // |a−b| ≤ ε theta join → bucketed equi join (kills the BNLJ plan)
    ext.injectOptimizerRule(_ => BandJoinRule)
    // interval-overlap theta join → both-sides-bucketed equi join
    // (INNER/CROSS, active when spark.graft.intervalJoin.width is
    // set); outer/semi/anti preserved-side forms additionally need
    // spark.graft.intervalJoin.maxSpan (round 14 — see the rule doc)
    ext.injectOptimizerRule(_ => IntervalJoinRule)
    // native AS-OF JOIN physical operator (graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // asof_join('left_tbl','right_tbl','key','time'[, tolerance]) —
    // the table-valued SQL surface of the native operator, so pure-SQL
    // callers reach AsOfJoinExec without the DataFrame API. Table and
    // column names are string literals resolved against the session
    // catalog at analysis time (the builder runs on the driver during
    // resolution, where SparkSession.active is the resolving session);
    // tolerance is an integer literal in the time column's long
    // backing unit (MICROSECONDS for timestamps).
    ext.injectTableFunction((
      FunctionIdentifier("asof_join"),
      new ExpressionInfo(classOf[AsOfJoin].getName, "asof_join"),
      (exprs: Seq[Expression]) => {
        def str(e: Expression, what: String): String = e.eval(null) match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case other => throw new IllegalArgumentException(
            s"asof_join: $what must be a string literal, got $other")
        }
        require(exprs.size >= 4 && exprs.size <= 6,
          "asof_join(left_tbl, right_tbl, key, time[, tolerance][, direction])")
        // arg 5 is either the integer tolerance or (when no tolerance
        // is wanted) the direction string; arg 6 is always direction
        def asTol(e: Expression): Option[Long] = e.eval(null) match {
          case i: Int => Some(i.toLong)
          case l: Long => Some(l)
          case _ => None
        }
        val (tol, dir) = exprs.drop(4) match {
          case Seq() => (None, "backward")
          case Seq(one) => asTol(one) match {
            case Some(t) => (Some(t), "backward")
            case None => (None, str(one, "direction"))
          }
          case Seq(t, d) => (
            Some(asTol(t).getOrElse(throw new IllegalArgumentException(
              "asof_join: tolerance must be an integer literal"))),
            str(d, "direction"))
        }
        val s = org.apache.spark.sql.SparkSession.active
        AsOfJoin.of(
          s.table(str(exprs(0), "left table")),
          s.table(str(exprs(1), "right table")),
          str(exprs(2), "key"), str(exprs(3), "time"), tol, dir)
          .queryExecution.analyzed
      }))
  }
}
