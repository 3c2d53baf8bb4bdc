package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin hash of a whole string's code points:
  * `acc = cp_0; acc = (acc*B + cp_i) % M` — the same fold contract as
  * [[WinnowFingerprint]] (and DuckDB's `list_reduce`, which seeds with
  * the first element), so the value is reproducible bit-for-bit by a
  * SQL oracle. M = 2^54 keeps `acc*257 + cp < 2^63` (no overflow) while
  * leaving 54 well-mixed bits — enough for a banded SimHash fingerprint.
  *
  * This replaces xxhash64 as the SimHash base hash: xxhash64 is opaque
  * to other engines, which is exactly what forced dedup_simhash to be a
  * no-oracle (weak) check before.
  */
case class KrHash(child: Expression, b: Long, m: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "kr_hash"

  override protected def nullSafeEval(input: Any): Any =
    KrHashF.hashUtf8(input.asInstanceOf[UTF8String], b, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KrHashF.hashUtf8($c, ${b}L, ${m}L);")

  override protected def withNewChildInternal(newChild: Expression): KrHash =
    copy(child = newChild)
}

/** KR hash of EVERY element of an `array<string>` in one pass —
  * semantically `transform(arr, s -> kr_hash(s))`, but `transform` is a
  * higher-order function (CodegenFallback) that drops the whole Project
  * out of whole-stage codegen; this fused expression keeps the dedup
  * fingerprint pipelines starred end-to-end. */
case class KrHashArray(child: Expression, b: Long, m: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kr_hash_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = KrHashF.hashUtf8(arr.getUTF8String(i), b, m)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.KrHashF.hashUtf8(
         |    $c.getUTF8String($i), ${b}L, ${m}L);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KrHashArray =
    copy(child = newChild)
}

object KrHashF {
  val B = 257L
  /** 2^54: products stay under 2^63; 54 usable fingerprint bits. */
  val M = 18014398509481984L

  /** The fold kernel, shared by interpreted eval and generated code
    * (static forwarder makes it Janino-callable). */
  def hashUtf8(s: UTF8String, b: Long, m: Long): Long = {
    val cps = s.toString.codePoints().toArray
    if (cps.isEmpty) 0L
    else {
      var acc = cps(0).toLong
      var i = 1
      while (i < cps.length) { acc = (acc * b + cps(i)) % m; i += 1 }
      acc
    }
  }

  def krHash(text: Column): Column =
    CatalystBridge.column(KrHash(CatalystBridge.expression(text), B, M))

  def krHashArray(arr: Column): Column =
    CatalystBridge.column(KrHashArray(CatalystBridge.expression(arr), B, M))
}
