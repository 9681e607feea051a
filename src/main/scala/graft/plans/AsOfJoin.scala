package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow,
  GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the (c)-tier of SURVEY §7.3's extension ladder
  * (custom LogicalPlan + Strategy + SparkPlan), for the one relational
  * operator the reference workload keeps needing that Spark lacks as a
  * first-class node. Semantics: for every LEFT row, attach the RIGHT
  * row with the same key whose time is the LATEST at-or-before the
  * left time (ties: the last co-timed right row in sort order), or
  * nulls — exactly DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.t >= r.t`.
  *
  * Why a physical operator when q27 composes the same answer from a
  * union + window: the compositional form materializes BOTH sides into
  * one shuffled stream and runs a window over the union; this node
  * keeps the sides separate (each shuffled/sorted once on its own
  * key/time — the SortMergeJoin shape), then streams a per-partition
  * MERGE with O(1) state (one buffered right row) and no window
  * machinery. Same exchange count, strictly less sort volume, and the
  * output stays left-ordered for free.
  *
  * Keys and times must be long-backed types (bigint / timestamp —
  * micros internally); the helper validates. Null keys/times never
  * match.
  *
  * `tolerance` (optional) is the `WITHIN` bound of DuckDB's / pandas
  * merge_asof's tolerance surface: the latest at-or-before right row
  * matches only if `l.time − r.time ≤ tolerance` (same unit as the
  * long backing — micros for timestamps); a match outside the bound
  * yields nulls, never an older row (any older row is farther away, so
  * the post-filter IS the tolerance semantics).
  *
  * `direction` (round 13) is pandas merge_asof's direction surface:
  *  - "backward" (default): latest right at-or-before the left time;
  *  - "forward": EARLIEST right at-or-after the left time (DuckDB's
  *    `ASOF ... ON l.t <= r.t`); tolerance bounds `r.time − l.time`.
  *    Co-timed-duplicate tie rule (ADVICE r13): when SEVERAL right
  *    rows carry exactly the left time, forward returns the LAST of
  *    them in sort order — the same tie rule as backward (the gap-0
  *    rows are consumed into the backward buffer, which serves both
  *    directions), where pandas merge_asof forward would return the
  *    first. Among rows with identical (key, time) the physical sort
  *    order is nondeterministic anyway (and DuckDB ASOF's equal-time
  *    pick is unspecified), so no tie choice here is reproducible
  *    across engines; callers needing a deterministic payload must
  *    pre-aggregate co-timed right rows to one row per (key, time);
  *  - "nearest": whichever of the two candidates has the smaller
  *    absolute gap (exact-time ties → the backward side), tolerance
  *    bounding the chosen gap. All three run in the SAME single-pass
  *    merge: after the advance loop the buffered row is the backward
  *    candidate and the un-consumed stream head is the forward one —
  *    no extra state, no second sort. A co-timed right row (gap 0)
  *    serves every direction. */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None,
    direction: String = "backward") extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, dir) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, dir,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long], direction: String,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  // observable in the Spark UI / SQLAppStatusStore like any built-in
  // join: output cardinality plus how many left rows actually matched
  // (the gap between them is the null-extension rate — the first thing
  // to check when an asof feed looks sparse)
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides cluster on the key (EnsureRequirements co-partitions
  // them, the SortMergeJoin contract) and sort within partitions by
  // (key, time) — the merge below is then single-pass
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val nRight = right.output.size
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val tol = tolerance
    val dir = direction
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(leftKey, leftOut)
      val lt = BindReferences.bindReference(leftTime, leftOut)
      val rk = BindReferences.bindReference(rightKey, rightOut)
      val rt = BindReferences.bindReference(rightTime, rightOut)
      val nullRow = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(allOut, allOut)
      val rBuf = rIter.buffered
      // one buffered candidate: the latest right row ≤ current left
      // time for matchKey — O(1) state per partition
      var matchRow: InternalRow = null
      var matchKey: Long = 0L
      var matchTime: Long = 0L
      lIter.map { l =>
        numOutputRows += 1
        val lkv = lk.eval(l)
        val ltv = lt.eval(l)
        if (lkv == null || ltv == null) proj(joined(l, nullRow))
        else {
          val lKey = lkv.asInstanceOf[Long]
          val lTime = ltv.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rkv = rk.eval(r)
            val rtv = rt.eval(r)
            if (rkv == null || rtv == null) { rBuf.next(); () }
            else {
              val rKey = rkv.asInstanceOf[Long]
              if (rKey < lKey) { rBuf.next(); () }
              else if (rKey == lKey &&
                  rtv.asInstanceOf[Long] <= lTime) {
                matchRow = r.copy(); matchKey = rKey
                matchTime = rtv.asInstanceOf[Long]; rBuf.next(); ()
              } else advance = false
            }
          }
          // after the advance loop: the buffered row is the BACKWARD
          // candidate (latest at-or-before, gap = lTime − matchTime)
          // and the un-consumed stream head is the FORWARD one
          // (earliest strictly-after; a gap-0 co-timed right was
          // consumed into the buffer and serves both directions).
          // tolerance never re-opens a farther row on either side.
          val hasB = matchRow != null && matchKey == lKey
          val bGap = lTime - matchTime
          var fRow: InternalRow = null
          var fGap = 0L
          if (dir != "backward" && !(hasB && bGap == 0L) &&
              rBuf.hasNext) {
            val h = rBuf.head
            val hk = rk.eval(h)
            val ht = rt.eval(h)
            if (hk != null && ht != null &&
                hk.asInstanceOf[Long] == lKey) {
              fRow = h
              fGap = ht.asInstanceOf[Long] - lTime
            }
          }
          val (cand, gap) = dir match {
            case "backward" =>
              if (hasB) (matchRow, bGap) else (null, 0L)
            case "forward" =>
              if (hasB && bGap == 0L) (matchRow, 0L)
              else if (fRow != null) (fRow, fGap)
              else (null, 0L)
            case _ => // nearest: smaller gap wins, ties → backward
              if (hasB && fRow != null) {
                if (bGap <= fGap) (matchRow, bGap) else (fRow, fGap)
              } else if (hasB) (matchRow, bGap)
              else if (fRow != null) (fRow, fGap)
              else (null, 0L)
          }
          if (cand != null && tol.forall(gap <= _)) {
            numMatchedRows += 1
            proj(joined(l, cand))
          } else proj(joined(l, nullRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  private def longBacked(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  /** left ASOF right on left.key = right.key AND left.time >= right.time,
    * keeping the latest matching right row (or nulls). Rename clashing
    * right columns before calling — the output carries both sides. */
  def of(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame =
    of(left, right, key, time, tolerance = None)

  /** As above with a `WITHIN` tolerance: match only if
    * `l.time − r.time ≤ tolerance`, in the time column's long backing
    * unit (MICROSECONDS for timestamp columns, raw for bigint). */
  def of(left: DataFrame, right: DataFrame,
      key: String, time: String, tolerance: Option[Long]): DataFrame =
    of(left, right, key, time, tolerance, "backward")

  /** Full surface: direction ∈ backward | forward | nearest (pandas
    * merge_asof's direction semantics — see the node doc), tolerance
    * bounding the matched gap in the long backing unit. */
  def of(left: DataFrame, right: DataFrame,
      key: String, time: String, tolerance: Option[Long],
      direction: String): DataFrame = {
    val s = left.sparkSession
    val lp = left.queryExecution.analyzed
    // self-join hygiene: when both sides derive from the same scan
    // they SHARE attribute exprIds, and the analyzer's
    // DeduplicateRelations doesn't know custom nodes — re-alias the
    // right side so its output ids are fresh (what Join gets for free)
    val rpRaw = right.queryExecution.analyzed
    val rp: LogicalPlan =
      if (rpRaw.outputSet.intersect(lp.outputSet).isEmpty) rpRaw
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rpRaw.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rpRaw)
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"asof: no column '$n' in ${p.output.map(_.name).mkString(",")}"))
    val (lkA, rkA) = (attr(lp, key), attr(rp, key))
    val (ltA, rtA) = (attr(lp, time), attr(rp, time))
    require(Seq(lkA, rkA, ltA, rtA).forall(longBacked),
      "asof join: key and time must be bigint or timestamp columns")
    require(tolerance.forall(_ >= 0L), "asof join: tolerance must be >= 0")
    require(Set("backward", "forward", "nearest")(direction),
      s"asof join: direction must be backward|forward|nearest, got $direction")
    GraftBridge.dataFrame(s,
      AsOfJoin(lp, rp, lkA, rkA, ltA, rtA, tolerance, direction))
  }
}
