package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns.
  *
  * Determinism contract: every reduction is an explicit LEFT FOLD with
  * per-element float→double casts, so the arithmetic is bit-identical in
  * any engine that folds left (DuckDB `list_reduce` in the oracles) —
  * no reliance on reduction order or float accumulation.
  */
object VectorFunctions {

  /** Left-fold dot product in double precision. Native codegen'd
    * expression ([[DotProduct]]) — the composed
    * `aggregate(zip_with(...))` form is CodegenFallback and ran
    * interpreted once per ANN candidate pair; the arithmetic
    * (per-element double casts, strict left fold) is unchanged, so
    * every DuckDB `list_reduce` oracle still matches bit-for-bit. */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  /** L2 norm (left-fold sum of squares). */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (norms are computed once
    * per row, not once per pair — compute them before the join). */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
