package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4648 Base64 (no line wrapping) as a native Catalyst expression.
  *
  * Spark's built-in `base64` uses the MIME encoder (CRLF every 76 chars),
  * which breaks interchange with engines that emit canonical Base64
  * (DuckDB `to_base64`, PostgreSQL `encode(..,'base64')`-unwrapped, most
  * object-store manifests). The reference's BLOB export
  * (Codeunit 60000 - Config. XML Exchange.al:1135 `ConvertBLOBToBase64String`)
  * produces a single unwrapped string, so graft matches that contract.
  *
  * Implemented with `doGenCode` so it stays inside whole-stage codegen —
  * no UDF wall in the export hot path.
  */
case class Base64NoWrap(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "base64_nowrap"

  override protected def nullSafeEval(bytes: Any): Any =
    UTF8String.fromBytes(
      java.util.Base64.getEncoder.encode(bytes.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromBytes(java.util.Base64.getEncoder().encode($c))")

  override protected def withNewChildInternal(newChild: Expression): Base64NoWrap =
    copy(child = newChild)
}

object Codec {
  /** Column API for [[Base64NoWrap]]. */
  def base64NoWrap(c: Column): Column =
    CatalystBridge.column(Base64NoWrap(CatalystBridge.expression(c)))
}
