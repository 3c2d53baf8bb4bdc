package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken):
  * Karp-Rabin rolling hash over code-point k-grams, then the minimum of
  * every w-hash window; the fingerprint is the sorted distinct set of
  * window minima. The value set is tie-rule independent (any argmin
  * picks the same VALUE), which is what makes an exact SQL oracle
  * possible.
  *
  * Arithmetic contract with the oracle (SparkEntry `doc_winnow`):
  * codepoints c_0..c_{n-1}; hash of gram i = fold
  * `acc = c_i; acc = (acc*B + c_j) % M` for the next k−1 codepoints;
  * all in 64-bit — acc < M = 1e9+7 and B = 257 keep products < 2^58.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int,
                             b: Long, m: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, w, b, m)

  /** Codegen: one static-kernel call per row (the same pattern many
    * Spark built-ins use for non-trivial algorithms) — the surrounding
    * stage stays inside whole-stage codegen, no interpreter wall. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.compute($c, $k, $w, ${b}L, ${m}L);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object Winnow {
  val K = 5; val W = 4; val B = 257L; val M = 1000000007L

  /** The winnowing kernel, shared by interpreted eval and generated
    * code (static forwarder makes it Janino-callable). */
  def compute(input: UTF8String, k: Int, w: Int, b: Long,
              m: Long): GenericArrayData = {
    val cps = input.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      var acc = cps(i).toLong
      var j = 1
      while (j < k) { acc = (acc * b + cps(i + j)) % m; j += 1 }
      hashes(i) = acc
      i += 1
    }
    val minima =
      if (nh < w) Array(hashes.min)
      else {
        val out = new Array[Long](nh - w + 1)
        var s = 0
        while (s <= nh - w) {
          var mn = Long.MaxValue
          var j = s
          while (j < s + w) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
          out(s) = mn
          s += 1
        }
        out
      }
    new GenericArrayData(
      minima.distinct.sorted.map(java.lang.Long.valueOf).toArray[Any])
  }

  def winnowFingerprint(text: Column): Column =
    CatalystBridge.column(
      WinnowFingerprint(CatalystBridge.expression(text), K, W, B, M))
}
