package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types._

/** int8 max-abs quantization summary of an `array<float>` embedding as
  * ONE fused codegen'd expression:
  * `struct(scale DOUBLE, checksum BIGINT, max_err DOUBLE, maxabs DOUBLE)`.
  *
  * The composed form (three aggregate/zip_with folds + a transform) is
  * CodegenFallback — an interpreter wall on a full-corpus map at
  * 100 TB. The kernel reproduces its arithmetic EXACTLY: per-element
  * double casts, strict left-to-right folds, rounding half-away-from-
  * zero (Spark's Round(HALF_UP) == DuckDB round), clamp to ±127 — so
  * the DuckDB oracle is unchanged.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  // validate at plan time, not per row: getFloat on a double array
  // would silently reinterpret bytes into garbage
  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"quantize_i8 needs array<float|double>, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("max_err", DoubleType, nullable = false),
    StructField("maxabs", DoubleType, nullable = false)))

  override def prettyName: String = "quantize_i8"

  override protected def nullSafeEval(input: Any): Any =
    QuantizeI8.compute(input.asInstanceOf[ArrayData], elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeI8.compute($c, $elemFloat);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

object QuantizeI8 {

  /** Round half away from zero — Spark Round(HALF_UP) / DuckDB round. */
  private def roundHalfAway(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  def compute(arr: ArrayData, elemFloat: Boolean): InternalRow = {
    val n = arr.numElements()
    def at(i: Int): Double =
      if (elemFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(at(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = if (maxabs > 0) 127.0 / maxabs else 1.0
    var checksum = 0L
    var maxErr = 0.0
    i = 0
    while (i < n) {
      val x = at(i)
      var q = roundHalfAway(x * scale)
      if (q < -127.0) q = -127.0
      if (q > 127.0) q = 127.0
      val ql = q.toLong
      checksum += ql * (i + 1)
      val err = math.abs(x - ql.toDouble / scale)
      if (err > maxErr) maxErr = err
      i += 1
    }
    InternalRow(scale, checksum, maxErr, maxabs)
  }

  def quantize(emb: Column): Column =
    CatalystBridge.column(QuantizeI8(CatalystBridge.expression(emb)))

  def distortion(emb: Column): Column =
    CatalystBridge.column(QuantizeDistortion(CatalystBridge.expression(emb)))
}

/** COSINE DISTORTION of int8 max-abs quantization: `1 - cos(x, dq(x))`
  * where dq = the dequantized vector (q / scale) — the quality number a
  * retrieval system actually cares about when deciding whether int8
  * storage is safe. Same fused-kernel stance as [[QuantizeI8]] and the
  * same cross-engine arithmetic contract: double casts, strict
  * left-to-right accumulation for the dot product and both norms
  * (matching the SQL oracle's sequential list_reduce folds), IEEE sqrt.
  * A zero vector (either side) has distortion 0 by definition. */
case class QuantizeDistortion(child: Expression) extends UnaryExpression {

  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"quantize_distortion needs array<float|double>, got $t")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantize_distortion"

  override protected def nullSafeEval(input: Any): Any =
    QuantizeDistortion.compute(input.asInstanceOf[ArrayData], elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QuantizeDistortion.compute($c, $elemFloat);")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeDistortion = copy(child = newChild)
}

object QuantizeDistortion {
  private def roundHalfAway(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  def compute(arr: ArrayData, elemFloat: Boolean): Double = {
    val n = arr.numElements()
    def at(i: Int): Double =
      if (elemFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(at(i))
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = if (maxabs > 0) 127.0 / maxabs else 1.0
    // strict left-to-right folds, one per accumulator — the same
    // association order as three sequential list_reduce calls in SQL
    var dp = 0.0; var nx = 0.0; var nd = 0.0
    i = 0
    while (i < n) {
      val x = at(i)
      var q = roundHalfAway(x * scale)
      if (q < -127.0) q = -127.0
      if (q > 127.0) q = 127.0
      val d = q / scale
      dp += x * d
      nx += x * x
      nd += d * d
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(nd)
    if (denom == 0.0) 0.0 else 1.0 - dp / denom
  }
}

/** SQ8 ASYMMETRIC COSINE: `cos(q, dequant_i8(x))` — the scalar-quantized
  * serving score (FAISS `IndexScalarQuantizer(QT_8bit)`'s asymmetric
  * distance, cosine metric). The left child is the RAW query vector, the
  * right child is a corpus vector served from int8 storage: it is
  * max-abs-quantized with [[QuantizeI8]]'s exact arithmetic (double
  * casts, round half away from zero, clamp ±127) and scored dequantized.
  * At 100 TB this is the 4×-cheaper scan [[QuantizeI8]]'s storage leg
  * buys: production reads `(codes int8[], scale)` off disk and never
  * touches the float vectors until the exact re-rank gather.
  *
  * Same fused-kernel stance as [[QuantizeDistortion]] and the same
  * cross-engine contract: three independent strict left-to-right folds
  * (dot, query norm², dequantized norm²), IEEE sqrt, zero-denominator →
  * 0. The DuckDB oracle replays quantization per element and folds in
  * the same order, so stage-1 ranking agrees bit-for-bit. */
case class Sq8Cosine(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"sq8_cosine needs array<float|double>, got $t")
  }
  private lazy val qFloat = elemIsFloat(left)
  private lazy val xFloat = elemIsFloat(right)

  /** Same stance as [[DotProduct]]: parquet array schemas admit null
    * SLOTS even when none was written, so the kernel gets an `isNullAt`
    * branch (whole result → NULL) instead of silently reading null
    * slots as 0.0 for arbitrary SQL callers. */
  private lazy val elemsNullable: Boolean =
    (left.dataType, right.dataType) match {
      case (ArrayType(_, n1), ArrayType(_, n2)) => n1 || n2
      case _ => true
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable
  override def prettyName: String = "sq8_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (elemsNullable)
      Sq8Cosine.computeOrNull(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], qFloat, xFloat)
    else
      Sq8Cosine.compute(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData], qFloat, xFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elemsNullable)
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        java.lang.Double ${ev.value}_r =
          graft.functions.Sq8Cosine.computeOrNull($a, $b, $qFloat, $xFloat);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")
    else
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.Sq8Cosine.compute($a, $b, $qFloat, $xFloat);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Cosine =
    copy(left = newLeft, right = newRight)
}

object Sq8Cosine {
  private def roundHalfAway(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  /** Non-null element slots (schema said `containsNull = false`).
    * Ragged inputs fail LOUDLY, like [[DotProduct.compute]]. */
  def compute(q: ArrayData, x: ArrayData,
              qFloat: Boolean, xFloat: Boolean): Double = {
    val n = checkLengths(q, x)
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(xAt(x, i, xFloat))
      if (a > maxabs) maxabs = a
      i += 1
    }
    accumulate(q, x, qFloat, xFloat, n, maxabs)
  }

  /** [[compute]] with an `isNullAt` branch: any null slot on either
    * side makes the whole score NULL (the SQL-facing semantics). */
  def computeOrNull(q: ArrayData, x: ArrayData,
                    qFloat: Boolean, xFloat: Boolean): java.lang.Double = {
    val n = checkLengths(q, x)
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || x.isNullAt(i)) return null
      val a = math.abs(xAt(x, i, xFloat))
      if (a > maxabs) maxabs = a
      i += 1
    }
    java.lang.Double.valueOf(accumulate(q, x, qFloat, xFloat, n, maxabs))
  }

  private def checkLengths(q: ArrayData, x: ArrayData): Int = {
    val n = x.numElements()
    if (q.numElements() != n)
      throw new IllegalArgumentException(
        s"sq8_cosine: vector lengths differ (${q.numElements()} vs $n)")
    n
  }

  private def xAt(x: ArrayData, i: Int, f: Boolean): Double =
    if (f) x.getFloat(i).toDouble else x.getDouble(i)

  private def accumulate(q: ArrayData, x: ArrayData,
                         qFloat: Boolean, xFloat: Boolean,
                         n: Int, maxabs: Double): Double = {
    val scale = if (maxabs > 0) 127.0 / maxabs else 1.0
    var dp = 0.0; var nq = 0.0; var nd = 0.0
    var i = 0
    while (i < n) {
      var c = roundHalfAway(xAt(x, i, xFloat) * scale)
      if (c < -127.0) c = -127.0
      if (c > 127.0) c = 127.0
      val d = c / scale
      val qv = xAt(q, i, qFloat)
      dp += qv * d
      nq += qv * qv
      nd += d * d
      i += 1
    }
    val denom = math.sqrt(nq) * math.sqrt(nd)
    if (denom == 0.0) 0.0 else dp / denom
  }

  def score(q: Column, x: Column): Column =
    CatalystBridge.column(Sq8Cosine(
      CatalystBridge.expression(q), CatalystBridge.expression(x)))
}
