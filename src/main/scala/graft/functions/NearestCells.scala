package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Coarse-quantizer cell assignment as a native Catalyst expression:
  * the `n` nearest centroids (by dot product against UNIT-NORM centroid
  * rows, which ranks identically to cosine) of an `array<float>`
  * embedding, as an `array<int>` of cell ids.
  *
  * This is the operation that makes IVF indexing map-only: each row
  * folds the whole (small, broadcast-as-literal) centroid matrix locally
  * and emits only its cell ids — zero exchanges before the cell
  * equi-join, where the previous formulation shuffled an N×nCells
  * cross product through a window just to take an argmax.
  *
  * Determinism: ties break toward the lower cell id; centroid rows are
  * baked into the expression, so the assignment is a pure function of
  * the input row.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
                        n: Int,
                        biases: Array[Double] = Array.empty)
    extends UnaryExpression {

  require(n >= 1 && n <= centroids.length,
    s"n=$n must be within 1..${centroids.length} cells")
  require(biases.isEmpty || biases.length == centroids.length,
    s"biases (${biases.length}) must match centroids (${centroids.length})")

  /** Per-cell additive bias, e.g. −‖c‖²/2 turns the dot-product argmax
    * into an L2 argmin over UNNORMALIZED centroids (product-quantizer
    * codebooks keep their magnitudes). Empty = all zero (the IVF
    * unit-norm case). */
  private val biasOf: Array[Double] =
    if (biases.isEmpty) Array.fill(centroids.length)(0.0) else biases

  /** Input may be `array<float>` (raw embeddings) or `array<double>`
    * (residuals `e − c` computed in double, which a residual product
    * quantizer must NOT round back to float — the oracle subtracts in
    * double too). Resolved lazily: the child is unbound at construction. */
  private lazy val doubleInput: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val nc = centroids.length
    val sims = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cent = centroids(c)
      val d = math.min(dims, cent.length)
      var acc = 0.0
      var j = 0
      if (doubleInput)
        while (j < d) { acc += arr.getDouble(j) * cent(j); j += 1 }
      else
        while (j < d) { acc += arr.getFloat(j).toDouble * cent(j); j += 1 }
      sims(c) = acc + biasOf(c)
      c += 1
    }
    val out = new Array[Any](n)
    val used = new Array[Boolean](nc)
    var s = 0
    while (s < n) {
      var best = -1
      var c2 = 0
      while (c2 < nc) {
        if (!used(c2) && (best < 0 || sims(c2) > sims(best))) best = c2
        c2 += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val centRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val biasRef = ctx.addReferenceObj("biases", biasOf, "double[]")
      val dims = ctx.freshName("dims")
      val nc = ctx.freshName("nc")
      val sims = ctx.freshName("sims")
      val cent = ctx.freshName("cent")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val used = ctx.freshName("used")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val get = if (doubleInput) s"$c.getDouble($j)"
                else s"((double) $c.getFloat($j))"
      s"""
         |int $dims = $c.numElements();
         |int $nc = $centRef.length;
         |double[] $sims = new double[$nc];
         |for (int $i = 0; $i < $nc; $i++) {
         |  double[] $cent = $centRef[$i];
         |  int $d = Math.min($dims, $cent.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $d; $j++) {
         |    $acc += $get * $cent[$j];
         |  }
         |  $sims[$i] = $acc + $biasRef[$i];
         |}
         |int[] $out = new int[$n];
         |boolean[] $used = new boolean[$nc];
         |for (int $s = 0; $s < $n; $s++) {
         |  int $best = -1;
         |  for (int $i = 0; $i < $nc; $i++) {
         |    if (!$used[$i] && ($best < 0 || $sims[$i] > $sims[$best])) $best = $i;
         |  }
         |  $used[$best] = true;
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object VectorQuantize {
  /** Column API: embedding (`array<float>`) → `array<int>` of the n
    * nearest cells of `centroids` (unit-norm rows expected). */
  def nearestCells(embedding: Column, centroids: Array[Array[Double]],
                   n: Int): Column =
    CatalystBridge.column(
      NearestCells(CatalystBridge.expression(embedding), centroids, n))

  /** Biased variant: ranks cells by `dot + bias_c` — with
    * `bias = −‖c‖²/2` this is the L2 argmin over unnormalized
    * codebooks a product quantizer needs. */
  def nearestCellsBiased(embedding: Column, centroids: Array[Array[Double]],
                         biases: Array[Double], n: Int): Column =
    CatalystBridge.column(
      NearestCells(CatalystBridge.expression(embedding), centroids, n, biases))
}
