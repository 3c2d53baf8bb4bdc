package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2 #210b — CONTINUOUS distinct-cardinality per source: the
  * [[graft.functions.HllSketch]] aggregate running as a streaming
  * aggregation in complete output mode — the live "how much distinct
  * text has each source contributed so far" card over a document
  * stream.
  *
  * This is the sketch family's whole argument in streaming form: an
  * EXACT streaming distinct would need unbounded state
  * (dropDuplicates over every shingle ever seen), which Spark rightly
  * refuses without a watermark that would silently change the answer;
  * the HLL register array is 64 BYTES of state per source, update is
  * max-of-rank (idempotent — re-delivered rows cannot inflate it, so
  * no pre-distinct stage is needed), and merge is elementwise max
  * through the state store. Output is |sources| rows per trigger.
  *
  * StreamingSpec proves the final batch equals
  * [[graft.operators.Sketches.hllEstimate]] over the same rows — the
  * batch twin of hll_distinct's estimate columns.
  */
object StreamDistinct {

  /** Running per-source HLL shingle-cardinality estimate. */
  def distinctCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(
        graft.functions.TextShingles.shingles3(
          graft.functions.TextShingles.words(col("text")))).as("t"))
      .select(col("source"),
        graft.functions.SketchHash.sketchHash(col("t")).as("g"))
      .groupBy("source")
      .agg(graft.functions.SketchAggregates.hll(col("g")).as("h"))
      .select(col("source"),
        col("h.n_regs_zero").cast("long").as("n_regs_zero"),
        col("h.s_scaled").as("s_scaled"),
        graft.operators.Sketches.hllEstimate(
          col("h.n_regs_zero"), col("h.s_scaled")).as("hll_est4"))
}
