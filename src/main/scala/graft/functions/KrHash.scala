package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}
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

  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    if (cps.isEmpty) 0L
    else {
      var acc = cps(0).toLong
      var i = 1
      while (i < cps.length) { acc = (acc * b + cps(i)) % m; i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |long $acc = 0L;
         |if ($cps.length > 0) {
         |  $acc = (long) $cps[0];
         |  for (int $i = 1; $i < $cps.length; $i++) {
         |    $acc = ($acc * ${b}L + (long) $cps[$i]) % ${m}L;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): KrHash =
    copy(child = newChild)
}

object KrHashF {
  val B = 257L
  /** 2^54: products stay under 2^63; 54 usable fingerprint bits. */
  val M = 18014398509481984L

  def krHash(text: Column): Column =
    CatalystBridge.column(KrHash(CatalystBridge.expression(text), B, M))
}
