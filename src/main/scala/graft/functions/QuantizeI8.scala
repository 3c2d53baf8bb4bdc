package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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

/** SQ8 DEQUANTIZED VECTOR: `dequant_i8(x)` as `array<double>` — the
  * value a serving tier reconstructs from [[QuantizeI8]]'s int8 storage
  * leg (`codes/scale`), computed ONCE PER CANDIDATE as a map-only pass
  * (one max-abs fold + one quantize/clamp/dequantize pass, the exact
  * arithmetic of the storage leg: double casts, round half away from
  * zero, clamp ±127). Scoring then rides the codegen'd [[DotProduct]]:
  * `cos(q, d) = dot(q, d) / (|q|·|d|)` — the asymmetric distance of
  * FAISS `IndexScalarQuantizer(QT_8bit)` — WITHOUT re-quantizing the
  * candidate once per query (the broadcast-query join would otherwise
  * multiply the quantization work by the query count; the DuckDB
  * oracles build their `dq` frame once per vector for the same reason).
  *
  * Null element slots propagate to a NULL result (the [[DotProduct]]
  * stance); schema-level `containsNull = false` skips the branch. */
case class Sq8Dequant(child: Expression) extends UnaryExpression {

  private lazy val elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"sq8_dequant needs array<float|double>, got $t")
  }

  private lazy val elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable || elemsNullable
  override def prettyName: String = "sq8_dequant"

  override protected def nullSafeEval(input: Any): Any =
    if (elemsNullable)
      Sq8Dequant.computeOrNull(input.asInstanceOf[ArrayData], elemFloat)
    else
      Sq8Dequant.compute(input.asInstanceOf[ArrayData], elemFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elemsNullable)
      nullSafeCodeGen(ctx, ev, c => s"""
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
          graft.functions.Sq8Dequant.computeOrNull($c, $elemFloat);
        if (${ev.value}_r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_r; }""")
    else
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Sq8Dequant.compute($c, $elemFloat);")

  override protected def withNewChildInternal(newChild: Expression): Sq8Dequant =
    copy(child = newChild)
}

object Sq8Dequant {
  private def roundHalfAway(v: Double): Double =
    if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)

  def compute(arr: ArrayData, elemFloat: Boolean): ArrayData = {
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
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      var c = roundHalfAway(at(i) * scale)
      if (c < -127.0) c = -127.0
      if (c > 127.0) c = 127.0
      out(i) = c / scale
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def computeOrNull(arr: ArrayData, elemFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    compute(arr, elemFloat)
  }

  def dequant(emb: Column): Column =
    CatalystBridge.column(Sq8Dequant(CatalystBridge.expression(emb)))
}
