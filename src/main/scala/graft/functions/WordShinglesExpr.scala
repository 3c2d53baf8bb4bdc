package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles as a native expression.
  *
  * Bit-identical to the composed form it replaces
  * (`array_distinct(transform(sequence(...), i -> concat_ws(' ', w[i..i+n-1])))`):
  * space-joined n-grams, first-occurrence order, UTF-8 byte equality —
  * which is also DuckDB `list_distinct` semantics, so the oracle contract
  * in [[TextShingles]] is unchanged.
  *
  * Why an Expression: the composed form runs interpreted (higher-order
  * lambdas are CodegenFallback) at ~40 µs/element; this is one tight JVM
  * loop per row. Codegen emits one static-kernel call, so the shingle
  * step no longer breaks the whole-stage span every dedup/fingerprint
  * pipeline starts with (CodegenSpec pins this).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShinglesExpr.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesExpr {

  private val sep = UTF8String.fromString(" ")

  /** The shingle kernel, shared by interpreted eval and generated code
    * (static forwarder makes it Janino-callable). */
  def compute(words: ArrayData, n: Int): GenericArrayData = {
    val count = words.numElements()
    if (count < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= count - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray[Object](Array.empty[Object]))
    }
  }

  def wordShingles(words: Column, n: Int): Column =
    CatalystBridge.column(WordShingles(CatalystBridge.expression(words), n))
}
