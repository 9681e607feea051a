package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982; the
  * deterministic counter-based family SpaceSaving belongs to): at most
  * k counters, total decrement mass ≤ n/(k+1), hence for every item
  * c_true − n/(k+1) ≤ ĉ ≤ c_true and any item with c_true > n/(k+1)
  * is GUARANTEED present. Counters are MERGEABLE with the same ε
  * (Agarwal et al., Mergeable Summaries, PODS 2012): merge = sum
  * counters of the union, then subtract the (k+1)-largest value and
  * drop non-positives — so map-side partials combine exactly like any
  * algebraic aggregate and the shuffle ships ≤ k counters per group
  * whatever the corpus size.
  *
  * The counter VALUES depend on arrival order and partitioning; the
  * two inequalities above do NOT — queries must publish only
  * theorem-guaranteed facts (membership above threshold, bound
  * satisfaction), exactly how q195 uses it. MgSpec pins the guarantees
  * across repartitionings.
  */
final class MgBuffer(val k: Int) {
  val counts = collection.mutable.HashMap.empty[String, Long]

  def add(term: String, c: Long = 1L): Unit = {
    counts.get(term) match {
      case Some(v) => counts.update(term, v + c)
      case None if counts.size < k => counts.update(term, c)
      case None =>
        // classic MG step: decrement all by the new item's weight,
        // capped at the current minimum so no counter goes negative
        // in one step (repeat while weight remains — bounded loop).
        var w = c
        while (w > 0 && counts.size >= k) {
          val m = math.min(w, counts.valuesIterator.min)
          counts.mapValuesInPlace((_, v) => v - m)
          counts.filterInPlace((_, v) => v > 0)
          w -= m
          if (w > 0 && counts.size < k) { counts.update(term, w); w = 0 }
        }
    }
  }

  /** PODS'12 merge: union-sum, then subtract the (k+1)-largest count
    * and keep strictly positive counters. */
  def mergeFrom(other: MgBuffer): Unit = {
    other.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > k) {
      val vs = counts.values.toArray.sorted(Ordering[Long].reverse)
      val cut = vs(k) // (k+1)-th largest
      counts.mapValuesInPlace((_, v) => v - cut)
      counts.filterInPlace((_, v) => v > 0)
    }
  }
}

/** Aggregate `mg_sketch(term, k)` → array<struct<term,cnt>> sorted
  * (cnt DESC, term ASC). See MgBuffer for the guarantee contract. */
case class MgSketchAgg(
    term: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def checkInputDataTypes(): TypeCheckResult = {
    if (term.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_sketch: term must be STRING, got ${term.dataType.sql}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("mg_sketch: k must be a literal INT")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(term, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType))))
  override def prettyName: String = "mg_sketch"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val t = term.eval(input)
    if (t != null) buf.add(t.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val rows = buf.counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.counts.update(in.readUTF(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(term = newChildren(0), kExpr = newChildren(1))
}

object MisraGries {
  /** mg_sketch(term, k): Column API entry. */
  def mgSketch(term: Column, k: Int): Column =
    GraftBridge.column(
      MgSketchAgg(GraftBridge.expression(term),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
