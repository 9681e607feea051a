package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Murmur3HashFunction, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch aggregate (Cormode & Muthukrishnan 2005):
  * `cms_sketch(col)` → a flat `array<bigint>` of depth×width counters.
  *
  * The sketch answers "approximately how often did THIS key occur"
  * for every key in constant memory — the complement of the bounded-heap
  * top-k aggregates, which keep exact counts but only for k keys. At
  * 100 TB the virtue is the merge: each mapper folds its partition into
  * a depth×width counter block, the shuffle carries one fixed-size
  * array per partition instead of a vocabulary-sized map, and merge is
  * elementwise addition (associative + commutative, so map-side combine
  * and arbitrary partitioning give bit-identical sketches — asserted in
  * CmsSpec). Streaming state for a frequency monitor is this same
  * fixed-size buffer.
  *
  * Row placement uses Spark's own Murmur3 chain so a point estimate is
  * expressible with NATIVE functions downstream — row d's bucket is
  * exactly `pmod(hash(lit(d), col), width)`: the `hash` expression folds
  * children as h = murmur3(child, seed = previous h) starting at 42,
  * with the running value truncated to Int between links. The estimate
  * never needs this class: `least(element_at(sk, d*width + bucket_d + 1)
  * for d <- 0 until depth)` — see QualityQueries.qCmsHeavyHitters.
  *
  * Estimates are one-sided: est >= exact always; est <= exact + eps·N
  * with probability 1 - exp(-depth) per query, eps = e/width.
  */
case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0, "cms_sketch: depth and width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  @transient private lazy val inputProj = UnsafeProjection.create(Seq(child))

  /** Per-row seeds replicating `hash(lit(d), col)`: murmur3 of the int d
    * at Spark's fixed seed 42, truncated to Int as the expression does
    * between children. */
  @transient private lazy val rowSeeds: Array[Int] =
    Array.tabulate(depth)(d =>
      Murmur3HashFunction.hash(d, IntegerType, 42L).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val u = inputProj(input)
    if (!u.isNullAt(0)) {
      val v = u.get(0, child.dataType)
      var d = 0
      while (d < depth) {
        val h = Murmur3HashFunction.hash(v, child.dataType,
          rowSeeds(d).toLong).toInt
        buf(d * width + java.lang.Math.floorMod(h, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = n)
}
