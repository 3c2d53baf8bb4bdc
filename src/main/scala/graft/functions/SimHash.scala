package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

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

/** SimHash fingerprint packed into a single LONG over the low `nBits`
  * bits of the input hashes (bit k = majority of bit k). Packing into a
  * long makes banding (`shiftright` + mask), Hamming distance
  * (`bit_count(a ^ b)`), and the SQL oracle twin all single built-in
  * operations on both engines. */
case class SimHashLong(child: Expression, nBits: Int) extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits=$nBits out of range")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](nBits)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var k = 0
      while (k < nBits) {
        if (((h >>> k) & 1L) == 1L) votes(k) += 1
        k += 1
      }
      j += 1
    }
    var fp = 0L
    var k = 0
    while (k < nBits) {
      if (votes(k) * 2 > n) fp |= (1L << k)
      k += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[$nBits];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $k = 0; $k < $nBits; $k++) {
         |    if ((($h >>> $k) & 1L) == 1L) $votes[$k]++;
         |  }
         |}
         |long $fp = 0L;
         |for (int $k = 0; $k < $nBits; $k++) {
         |  if ($votes[$k] * 2 > $n) $fp |= (1L << $k);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashLong =
    copy(child = newChild)
}

object SimHash {
  def simhashBits(hashes: Column): Column =
    CatalystBridge.column(SimHashBits(CatalystBridge.expression(hashes)))

  def simhashFingerprint(hashes: Column, nBits: Int): Column =
    CatalystBridge.column(SimHashLong(CatalystBridge.expression(hashes), nBits))
}
