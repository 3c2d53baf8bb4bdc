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

  /** Left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm (left-fold sum of squares). */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (norms are computed once
    * per row, not once per pair — compute them before the join). */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
