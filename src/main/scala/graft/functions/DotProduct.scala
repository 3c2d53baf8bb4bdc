package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-fold dot product of two float/double array columns as a native
  * codegen'd expression.
  *
  * Semantics are IDENTICAL to the previous `aggregate(zip_with(...))`
  * formulation (per-element →double casts, strict left-to-right
  * accumulation — the repo's cross-engine contract, reproduced by
  * DuckDB `list_reduce` in the oracles), but the higher-order built-ins
  * are CodegenFallback: they unstarred the surrounding Project and ran
  * INTERPRETED on the hottest inner loop the ANN family has — once per
  * candidate pair. This expression is the [[Winnow]]-style static
  * kernel instead: one straight-line loop, whole-stage codegen intact.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product needs array<float|double>, got $t")
  }
  private lazy val aFloat = elemIsFloat(left)
  private lazy val bFloat = elemIsFloat(right)

  /** Can an element SLOT be null (schema-level `containsNull`)? Parquet
    * array columns say true even when no null was ever written, so this
    * can't be a plan-time rejection — instead the kernel gets an
    * `isNullAt` branch and the whole result goes NULL, matching what
    * the replaced `aggregate(zip_with(...))` form propagated (the old
    * fast path silently read null slots as 0.0 — wrong numbers for SQL
    * callers handing in arbitrary arrays). */
  private lazy val elemsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, n1), ArrayType(_, n2)) => n1 || n2
    case _ => true
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (elemsNullable)
      DotProduct.computeOrNull(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], aFloat, bFloat)
    else
      DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
        aFloat, bFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elemsNullable)
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Double ${ev.value}_r =
          graft.functions.DotProduct.computeOrNull($a, $b, $aFloat, $bFloat);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")
    else
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.DotProduct.compute($a, $b, $aFloat, $bFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Strict left fold in double precision (the cross-engine contract).
    * `aFloat`/`bFloat` select the element accessor; the per-element
    * value is the same double the old zip_with cast produced.
    *
    * Contract: equal-length vectors of NON-NULL element slots (the
    * planner picks this kernel only when the schema says
    * `containsNull = false`; otherwise [[computeOrNull]] runs).
    * Ragged inputs fail LOUDLY — the replaced zip_with form returned a
    * silent NULL there; a thrown mismatch beats that. */
  def compute(a: ArrayData, b: ArrayData,
              aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: vector lengths differ ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** [[compute]] with an `isNullAt` branch: any null element slot makes
    * the whole dot product NULL (the SQL-facing semantics); lengths
    * still fail loudly. Selected when the child schema admits null
    * slots — the bit test is cheap enough to keep on the ANN hot path,
    * where parquet schemas always say `containsNull = true`. */
  def computeOrNull(a: ArrayData, b: ArrayData,
                    aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_product: vector lengths differ ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dot(a: Column, b: Column): Column =
    CatalystBridge.column(DotProduct(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))
}
