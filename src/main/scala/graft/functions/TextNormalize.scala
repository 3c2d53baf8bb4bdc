package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical decomposition + canonical
  * composition, UAX #15) as a codegen'd scalar — the canonicalization
  * a dedup pipeline needs BEFORE hashing text: the same visible string
  * can arrive as composed or decomposed code points (é as U+00E9 or
  * e+U+0301, Å as U+00C5 / U+212B / A+U+030A) and every exact-hash
  * operator in the engine would otherwise treat them as distinct
  * documents.
  *
  * Delegates to `java.text.Normalizer` (ICU-equivalent table from the
  * JDK's Unicode data), which DuckDB's `nfc_normalize` reproduces —
  * so the operator is oracle-checkable bit-for-bit. Fast path: pure
  * ASCII input (the overwhelming case in a web corpus) is already NFC
  * and `Normalizer.isNormalized` short-circuits without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs a string argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextNormalizeF.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNormalizeF.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object TextNormalizeF {
  import java.text.Normalizer

  /** NFC-normalize a UTF8String; returns the input object unchanged
    * (no copy) when it is already normalized. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
