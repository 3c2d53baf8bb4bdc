package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/** K-MINIMUM-VALUES distinct sketch as a mergeable
  * `TypedImperativeAggregate` — the bounded-state shape
  * [[TopKFrequent]]'s scaladoc promises for high-cardinality input:
  * the buffer IS the sketch (the k smallest DISTINCT hash values seen),
  * partials are k·8 B regardless of input size, and merge is a bounded
  * set-union-then-trim. One aggregate pass replaces "sort all distinct
  * values per group and take k" — no per-group window, no full sort.
  *
  * eval returns the ascending value array (≤ k longs); the KMV
  * estimator `(k−1) / (v_k / 2^63)` is plain column arithmetic
  * downstream, so a SQL oracle can replay every step.
  */
case class MinKDistinct(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"minK needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_k_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // skip values already above the current k-th: O(log k) membership
    // cost only for candidates that could enter the sketch
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new Array[Byte](4 + 8 * buf.size)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bytes
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinKDistinct =
    copy(child = newChildren.head)
}

/** HYPERLOGLOG distinct sketch (m = 64 registers, p = 6) as a
  * mergeable `TypedImperativeAggregate`: the buffer is the 64-byte
  * register array itself, update is max-of-rank, merge is elementwise
  * max — the canonical "64 bytes per group per partial" cardinality
  * shape that makes distinct counting a map-side-combine at 100 TB.
  *
  * Bit layout over the 63-bit [[SketchMix]] hash: register = low 6
  * bits; w = the next 51 bits; rank ρ = 52 − bitlen(w) (w = 0 → 52),
  * so ρ ∈ [1, 52] and an EMPTY register is 0 — distinct from every
  * occupied rank.
  *
  * eval returns `(n_regs_zero, s_scaled)` where
  * `s_scaled = Σ_j 2^(52−M_j)` as an EXACT integer (≤ 64·2^52 < 2^59):
  * the harmonic-mean denominator Σ 2^−M_j equals `s_scaled / 2^52`
  * with no floating-point accumulation, so the estimate is
  * reproducible bit-for-bit from integer state by any engine —
  * the SQL oracle replays registers with `%`, `//`, `bin()` and `<<`.
  */
case class HllSketch(child: Expression, regs: Boolean = false,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketch._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (regs) ArrayType(IntegerType, containsNull = false)
    else StructType(Seq(
      StructField("n_regs_zero", IntegerType, nullable = false),
      StructField("s_scaled", LongType, nullable = false)))
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val g = v.asInstanceOf[Long]
      val reg = (g & (M - 1)).toInt
      val w = (g >>> P) & ((1L << WBITS) - 1)
      val rho = (if (w == 0L) WBITS + 1
                 else WBITS + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buf(reg)) buf(reg) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    if (regs) new GenericArrayData(buf.map(_.toInt))
    else {
      var zero = 0
      var s = 0L
      var i = 0
      while (i < M) {
        if (buf(i) == 0) zero += 1
        s += 1L << (WBITS + 1 - buf(i))
        i += 1
      }
      InternalRow(zero, s)
    }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

object HllSketch {
  /** p = 6 → m = 64 registers; 51 rank bits of the 63-bit hash. */
  val P = 6
  val M = 64
  val WBITS = 51
}

object SketchAggregates {
  def minK(c: Column, k: Int): Column =
    CatalystBridge.column(
      MinKDistinct(CatalystBridge.expression(c), k).toAggregateExpression())

  def hll(c: Column): Column =
    CatalystBridge.column(
      HllSketch(CatalystBridge.expression(c)).toAggregateExpression())

  /** The same HLL aggregate evaluated to its RAW 64 registers — the
    * mergeable state itself, for queries that do sketch ALGEBRA
    * downstream (cross-source union via elementwise max) instead of
    * finishing the estimate inside the aggregate. */
  def hllRegs(c: Column): Column =
    CatalystBridge.column(
      HllSketch(CatalystBridge.expression(c), regs = true)
        .toAggregateExpression())
}
