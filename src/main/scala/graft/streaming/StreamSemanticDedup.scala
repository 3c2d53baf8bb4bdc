package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2 #96c — CONTINUOUS semantic dedup at ingest: each arriving
  * micro-batch of (vec_id, embedding) vectors is decided against the
  * accumulated KEPT corpus with the proven incremental operator
  * ([[Similarity.semanticDedupIncrementalFrom]]), and the batch's kept
  * vectors join the corpus — the embedding-space twin of [[StreamDedup]]
  * (text) and [[StreamPhash]]/[[StreamWavFp]] (media), completing the
  * ingest-dedup family across every modality the engine fingerprints.
  *
  * ONE artifact, TWO uses: the kept corpus is maintained AS an IVF
  * index ([[Similarity.ivfIndexToDir]]'s layout — the base build seeds
  * it and fixes the quantizer; kept vectors land as cell-partitioned
  * `stream/batch_id=N` deltas), so the deduped corpus is immediately
  * servable through [[Similarity.annServeFromIndex]] /
  * [[StreamAnn]] with no export step — dedup-at-ingest and
  * retrieval share state.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay (the
  * [[StreamPairs]] stance): decisions and kept deltas land in
  * `batch_id=N` overwrite partitions, and the base read for batch N
  * excludes delta N — a replayed batch overwrites its own output and
  * cannot pair against itself as history. Per-batch cost ∝ increment:
  * one map-only assignment (broadcast centroids) + one cell equi-join
  * whose probe side is the batch.
  */
object StreamSemanticDedup {

  /** Decide one micro-batch (keyed by `batchId`) against the
    * accumulated kept corpus at `dir`; write decisions and kept
    * vectors into the batch's own partitions. private[graft]:
    * StreamingSpec drives it directly to prove replay idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                dir: String, outDir: String,
                                tau: Double): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // replay of a compaction-folded batch: kept vectors are in the
    // folded assigned/ base and decisions in the folded log — skip
    // (older ids fail loudly, StreamIO.foldedByCompaction)
    if (StreamIO.foldedByCompaction(s"$dir/assigned", batchId, conf)
        || StreamIO.foldedByCompaction(outDir, batchId, conf)) return
    val b = batch.select(col("vec_id"), col("embedding"))
    val cents = Similarity.readIvfCentroids(spark, dir)
    val base = {
      val all = Similarity.readIvfAssignedWithBatchId(spark, dir)
      all.filter(coalesce(col("batch_id") =!= batchId, lit(true)))
        .drop("batch_id")
    }
    // persist: the decision frame feeds both the log write and the
    // kept filter — without the cache the assignment + cell join would
    // execute twice
    val decisions = Similarity
      .semanticDedupIncrementalFrom(base, b, cents, tau)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    decisions.select("vec_id", "cell", "decision")
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    val kept = Similarity.assignWithCentroids(
      b.join(decisions.filter(col("decision") === "kept")
        .select("vec_id"), "vec_id"), cents)
    // an all-near batch lands no delta: a fileless batch_id dir would
    // trip schema inference on the stream root, and the decision is
    // deterministic so a replay recomputes the same emptiness
    if (!kept.isEmpty)
      kept.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/stream/batch_id=$batchId")
    decisions.unpersist()
    ()
  }

  /** Start continuous semantic dedup of `vectors` (needs vec_id,
    * embedding) against the index artifact at `dir` (seeded by
    * [[Similarity.ivfIndexToDir]], which also fixes the quantizer). */
  def start(vectors: DataFrame, dir: String, outDir: String,
            checkpoint: String, tau: Double = 0.4): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, dir, outDir, tau)
      }
      .start()
}
