package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * loop per row. CodegenFallback here is fine — the expression itself is
  * the loop, not a per-element lambda.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
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

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesExpr {
  def wordShingles(words: Column, n: Int): Column =
    CatalystBridge.column(WordShingles(CatalystBridge.expression(words), n))
}
