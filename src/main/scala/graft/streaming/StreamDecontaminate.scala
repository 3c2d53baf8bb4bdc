package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2 #229b — CONTINUOUS semantic contamination gate at ingest: each
  * arriving micro-batch of (vec_id, embedding) corpus vectors is gated
  * against the FIXED held-out eval set with the proven two-frame core
  * ([[Similarity.decontaminateSemanticFrom]]) and its per-doc evidence
  * rows land in the batch's own partition — so contaminated training
  * data is flagged the moment it arrives, not at the next full-corpus
  * audit (the streaming twin of `decontaminate_semantic`, and the
  * embedding-space sibling of [[DocIngest]]'s gram-overlap gate).
  *
  * The eval side is PRE-PAID: [[Similarity.decontaminationGateToDir]]
  * materializes the trained quantizer plus the eval split's probe rows
  * once; each micro-batch then costs one map-only cell assignment plus
  * one broadcast cell equi-join against the KB-sized probe table —
  * cost ∝ increment, nothing corpus-sized anywhere.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay: verdicts
  * are a pure per-doc function of (batch row, gate artifact), so a
  * replayed batch recomputes identical rows into its own overwritten
  * `batch_id=N` partition (the [[StreamPairs]] stance, with no
  * cross-batch state to exclude — per-doc independence is what makes
  * streamed prefixes equal the batch run row-for-row, which
  * StreamingSpec pins).
  */
object StreamDecontaminate {

  /** Gate one micro-batch against the artifact at `gateDir`; write its
    * evidence rows into the batch's own partition. private[graft]:
    * StreamingSpec drives it directly to prove replay idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                gateDir: String, outDir: String,
                                tau: Double): Unit = {
    val spark = batch.sparkSession
    // a gate whose build crashed between the centroid and probe
    // writes may pair probes with retired centroids — refuse loudly
    Similarity.requireGateComplete(spark, gateDir)
    applyBatchWith(batch, batchId,
      Similarity.readIvfCentroids(spark, gateDir),
      spark.read.parquet(s"$gateDir/eval_probes"), outDir, tau)
  }

  private def applyBatchWith(batch: DataFrame, batchId: Long,
                             cents: Array[Array[Double]],
                             probes: DataFrame, outDir: String,
                             tau: Double): Unit =
    Similarity.decontaminateSemanticFrom(
        batch.select(col("vec_id"), col("embedding")), probes, cents, tau)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Start the continuous gate over `vectors` (needs vec_id,
    * embedding) against the gate artifact at `gateDir` (built by
    * [[Similarity.decontaminationGateToDir]], which fixes the
    * quantizer the probes are meaningful under). The gate is
    * IMMUTABLE by contract, so it is validated and loaded ONCE here —
    * a torn gate fails at stream start, not at the first batch, and
    * per-batch cost stays ∝ the increment (no per-batch marker check,
    * centroid collect, or footer read). */
  def start(vectors: DataFrame, gateDir: String, outDir: String,
            checkpoint: String, tau: Double = 0.4): StreamingQuery = {
    val spark = vectors.sparkSession
    Similarity.requireGateComplete(spark, gateDir)
    val cents = Similarity.readIvfCentroids(spark, gateDir)
    val probes = spark.read.parquet(s"$gateDir/eval_probes")
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchWith(batch, batchId, cents, probes, outDir, tau)
      }
      .start()
  }
}
