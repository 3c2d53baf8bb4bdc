package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._
import scala.collection.mutable

/** Exact bounded top-k by score as a mergeable
  * `TypedImperativeAggregate`: keeps at most k (id, score) entries per
  * partial buffer, merged binary at the reducer.
  *
  * This is the aggregation shape a brute-force ANN ranking needs at
  * scale: `row_number().over(Window.partitionBy(query))` shuffles EVERY
  * scored (query, candidate) row into the window sort — the whole N×Q
  * cross product — whereas this aggregate's exchange carries at most
  * k rows per query per map partition. Same result, ~N/k× less shuffle.
  *
  * Ordering contract (identical to the window it replaces): score
  * descending, id ascending on ties — deterministic for any input order.
  */
case class TopKByScore(idExpr: Expression, scoreExpr: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Double)]] {

  require(k >= 1, s"k=$k must be positive")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("neighbor_id", LongType),
      StructField("cos", DoubleType))), containsNull = false)
  override def prettyName: String = "topk_by_score"

  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def insert(buf: mutable.ArrayBuffer[(Long, Double)],
                     id: Long, s: Double): Unit = {
    if (buf.size < k) { buf += ((id, s)); () }
    else {
      var worst = 0
      var i = 1
      while (i < buf.size) {
        if (beats(buf(worst)._2, buf(worst)._1, buf(i)._2, buf(i)._1))
          worst = i
        i += 1
      }
      if (beats(s, id, buf(worst)._2, buf(worst)._1)) buf(worst) = ((id, s))
    }
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Double)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Long, Double)],
                      input: InternalRow): mutable.ArrayBuffer[(Long, Double)] = {
    val id = idExpr.eval(input)
    val s = scoreExpr.eval(input)
    if (id != null && s != null)
      insert(buf, id.asInstanceOf[Long], s.asInstanceOf[Double])
    buf
  }

  override def merge(a: mutable.ArrayBuffer[(Long, Double)],
                     b: mutable.ArrayBuffer[(Long, Double)]): mutable.ArrayBuffer[(Long, Double)] = {
    b.foreach { case (id, s) => insert(a, id, s) }
    a
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Double)]): Any = {
    val sorted = buf.sortWith { case ((i1, s1), (i2, s2)) =>
      beats(s1, i1, s2, i2)
    }
    new GenericArrayData(
      sorted.map { case (id, s) => InternalRow(id, s) }.toArray[Any])
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (id, s) => out.writeLong(id); out.writeDouble(s) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Double)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[(Long, Double)]
    (0 until n).foreach(_ => buf += ((in.readLong(), in.readDouble())))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
}

object TopKByScoreAgg {
  def topkByScore(id: Column, score: Column, k: Int): Column =
    CatalystBridge.column(
      TopKByScore(CatalystBridge.expression(id),
        CatalystBridge.expression(score), k).toAggregateExpression())
}
