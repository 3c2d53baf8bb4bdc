package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's code-point distribution —
  * the standard gibberish/boilerplate gate a pretraining quality funnel
  * runs beside the stopword ratios: natural language sits ~3.5-4.5
  * bits, base64/hex blobs higher, repeated-char padding near 0.
  *
  * Implemented as a native codegen'd expression so the gate is MAP-ONLY:
  * the composed DataFrame form (explode chars → two groupBys) would
  * shuffle one row per CHARACTER — at 100 TB that is the corpus itself,
  * shuffled twice, for a per-row scalar.
  *
  * Determinism contract (the cross-engine rule of [[DotProduct]]):
  * H = log2(n) − (Σ c·log2 c)/n with the Σ folded LEFT over counts in
  * ASCENDING CODE-POINT order — reproduced bit-for-bit by the DuckDB
  * oracle's `list_reduce` over `list(... ORDER BY ch)`.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyF.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyF.entropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropyF {

  private val Log2 = math.log(2.0)

  /** The kernel (static forwarder: Janino-callable from generated
    * code). Empty string → 0.0 by convention. */
  def entropy(s: UTF8String): Double = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0.0
    java.util.Arrays.sort(cps) // counts emitted in code-point order
    var acc = 0.0
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && cps(j) == cps(i)) j += 1
      val c = (j - i).toDouble
      acc += c * (math.log(c) / Log2)
      i = j
    }
    math.log(n.toDouble) / Log2 - acc / n
  }

  def charEntropy(text: Column): Column =
    CatalystBridge.column(CharEntropy(CatalystBridge.expression(text)))
}
