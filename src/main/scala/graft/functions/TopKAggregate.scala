package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** Exact bounded top-k frequent items as a custom
  * `TypedImperativeAggregate` — the mergeable-sketch operator shape
  * (partial per partition, binary-serialized buffers merged at the
  * reducer), demonstrated with an EXACT dictionary so the result is
  * oracle-checkable against `GROUP BY … ORDER BY count LIMIT k`.
  *
  * Exactness bound: the per-buffer dictionary is capped at `maxDict`
  * distinct keys; if a partition exceeds it the aggregate fails loudly
  * rather than silently approximating. For high-cardinality columns at
  * scale you'd swap the dictionary for SpaceSaving/CMS inside the SAME
  * operator shell — buffer layout and merge protocol stay as they are.
  */
case class TopKFrequent(child: Expression, k: Int, maxDict: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType),
      StructField("cnt", LongType))), containsNull = false)
  override def prettyName: String = "topk_frequent"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // the incoming UTF8String is a view into a reused row buffer —
      // copy before storing it as a map key (lookup by value is fine)
      val transient = v.asInstanceOf[UTF8String]
      buf.get(transient) match {
        case Some(n) => buf.update(transient, n + 1L)
        case None => buf.update(transient.copy(), 1L)
      }
      require(buf.size <= maxDict,
        s"topk_frequent dictionary exceeded $maxDict distinct keys — " +
          "use a sketch variant for high-cardinality input")
    }
    buf
  }

  override def merge(a: mutable.HashMap[UTF8String, Long],
                     b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (key, n) => a.update(key, a.getOrElse(key, 0L) + n) }
    // same loud bound as update(): a reducer merging many partials must
    // not exceed the promised memory envelope silently
    require(a.size <= maxDict,
      s"topk_frequent merged dictionary exceeded $maxDict distinct keys — " +
        "use a sketch variant for high-cardinality input")
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic: count desc, then item asc (binary UTF-8 order)
    val top = buf.toSeq
      .sortBy { case (item, n) => (-n, item) }
      .take(k)
      .map { case (item, n) =>
        InternalRow(item.copy(), n)
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, n) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(n)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKFrequent =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKFrequent =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKFrequent =
    copy(child = newChildren.head)
}

object TopKAggregate {
  def topkFrequent(c: Column, k: Int, maxDict: Int = 100000): Column =
    CatalystBridge.column(
      TopKFrequent(CatalystBridge.expression(c), k, maxDict)
        .toAggregateExpression())
}
