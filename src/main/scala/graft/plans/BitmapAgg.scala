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

/** Growable word-aligned bitset over non-negative ids — the engine's
  * roaring-bitmap-lite. OR-merge is commutative and idempotent, so the
  * aggregate is partitioning-invariant BY ALGEBRA (the q97-checksum
  * argument): any executor layout produces the identical word array,
  * which is why — unlike the MG sketch — the bitmap itself is safe to
  * publish and set algebra on two bitmaps (AND/OR popcounts) is exact.
  * The id-space bound is the honest cost: memory is maxId/8 bytes per
  * group, the right tool when ids are dense ints (user ids, doc ids
  * after q105-style dense shuffling) — for open-ended domains q49/q147's
  * sketches are the path. */
final class BitmapBuffer(var words: Array[Long]) {
  def this() = this(Array.empty[Long])

  def add(id: Long): Unit = {
    val w = (id >> 6).toInt
    if (w >= words.length) {
      val grown = new Array[Long](math.max(w + 1, words.length * 2))
      System.arraycopy(words, 0, grown, 0, words.length)
      words = grown
    }
    words(w) |= 1L << (id & 63)
  }

  def orFrom(other: BitmapBuffer): Unit = {
    if (other.words.length > words.length) {
      val grown = new Array[Long](other.words.length)
      System.arraycopy(words, 0, grown, 0, words.length)
      words = grown
    }
    var i = 0
    while (i < other.words.length) { words(i) |= other.words(i); i += 1 }
  }

  /** Trailing zero words stripped, so equal SETS give equal arrays. */
  def canonical: Array[Long] = {
    var n = words.length
    while (n > 0 && words(n - 1) == 0L) n -= 1
    java.util.Arrays.copyOf(words, n)
  }
}

/** Aggregate `bitmap_agg(id)` → array<long> bitset words (canonical:
  * no trailing zero words). Ids must be non-negative. */
case class BitmapAgg(
    id: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bitmap_agg: id must be BIGINT, got ${id.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_agg"

  override def createAggregationBuffer(): BitmapBuffer = new BitmapBuffer()

  override def update(buf: BitmapBuffer, input: InternalRow): BitmapBuffer = {
    val v = id.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      if (l < 0) throw new IllegalArgumentException(
        s"bitmap_agg: negative id $l")
      buf.add(l)
    }
    buf
  }

  override def merge(buf: BitmapBuffer, other: BitmapBuffer): BitmapBuffer = {
    buf.orFrom(other)
    buf
  }

  override def eval(buf: BitmapBuffer): Any =
    new GenericArrayData(buf.canonical)

  override def serialize(buf: BitmapBuffer): Array[Byte] = {
    val w = buf.canonical
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(w.length)
    w.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BitmapBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val w = new Array[Long](n)
    var i = 0
    while (i < n) { w(i) = in.readLong(); i += 1 }
    new BitmapBuffer(w)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0))
}

object BitmapFunctions {
  /** bitmap_agg(id): Column API entry (numeric ids cast to long). */
  def bitmapAgg(id: Column): Column =
    GraftBridge.column(
      BitmapAgg(GraftBridge.expression(id.cast("long")))
        .toAggregateExpression())
}
