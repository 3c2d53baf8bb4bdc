package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** 64-bit SimHash bit vector as a native Catalyst expression.
  *
  * Bit k = 1 iff the majority of input hashes have bit k set — identical
  * to the interpreted `transform(sequence(0,63), k -> CASE WHEN
  * size(filter(hx, ...)) ...)` form it replaces, but one pass over the
  * hashes with an int[64] vote counter instead of 64 interpreted filter
  * scans per row.
  */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var k = 0
      while (k < 64) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1
        k += 1
      }
      j += 1
    }
    val bits = new Array[Any](64)
    var k = 0
    while (k < 64) {
      bits(k) = if (votes(k) * 2 > n) 1 else 0
      k += 1
    }
    new GenericArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val bits = ctx.freshName("bits")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $k = 0; $k < 64; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $votes[$k]++;
         |  }
         |}
         |int[] $bits = new int[64];
         |for (int $k = 0; $k < 64; $k++) {
         |  $bits[$k] = ($votes[$k] * 2 > $n) ? 1 : 0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bits);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHash {
  def simhashBits(hashes: Column): Column =
    CatalystBridge.column(SimHashBits(CatalystBridge.expression(hashes)))
}
