package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Blob

/** §2 #204e — CONTINUOUS audio near-dup ingest: every arriving
  * micro-batch of documents is fingerprinted (RIFF/WAVE encode →
  * decode → 56-bit energy-envelope dHash) and deduped against the
  * accumulated base FINGERPRINT table with the proven incremental
  * operator ([[graft.operators.Blob.mediaWavFpIncrementalFrom]]);
  * decisions are appended to a log and the batch's kept fingerprints
  * join the base — the audio twin of [[StreamPhash]], closing the
  * streaming ingest path across both media modalities.
  *
  * Same economics: base state is 8 bytes per audio document (the
  * fingerprint, never the samples), each batch decodes only its own
  * audio (map-only), and the 8 × 7 band join probes with the batch
  * side only — per-batch cost ∝ increment, recall pigeonhole-exact at
  * the radius-7 default.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay (the
  * [[StreamPairs]] stance, shared with [[StreamPhash]]): both writes
  * land in `batch_id=N` subdirectories with mode(overwrite), and the
  * base read for batch N excludes partition N — replays overwrite
  * instead of duplicating. The two writes are the lakehouse APPEND
  * seam (docs/LAKEHOUSE.md).
  */
object StreamWavFp {

  /** Dedup one micro-batch (keyed by `batchId`) against the
    * accumulated base fingerprints; write decisions and kept
    * fingerprints into the batch's own partition. private[graft]:
    * StreamingSpec drives it directly to prove replay idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                baseDir: String, outDir: String,
                                maxHamming: Int): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // replay of a compaction-folded batch: kept fingerprints and
    // decisions are already in the folded partitions — skip (older
    // ids fail loudly, StreamIO.foldedByCompaction)
    if (StreamIO.foldedByCompaction(baseDir, batchId, conf)
        || StreamIO.foldedByCompaction(outDir, batchId, conf)) return
    val b = batch.select(col("doc_id"), col("text"))
    val base = StreamPairs.readAccumulated(spark, baseDir)
      .map(_.filter(col("batch_id") =!= batchId)
        .select(col("doc_id"), col("fp")))
      .getOrElse(spark.range(0).select(col("id").as("doc_id"),
        col("id").as("fp")))
    // persist: the decision frame feeds both writes — without the
    // cache the fingerprint mapPartitions (WAV encode + decode per
    // doc) would run twice
    val decisions = Blob.mediaWavFpIncrementalFrom(base, b, maxHamming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    decisions.select("doc_id", "decision")
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    decisions.filter(col("decision") === "kept")
      .select("doc_id", "fp")
      .write.mode("overwrite").parquet(s"$baseDir/batch_id=$batchId")
    decisions.unpersist()
    ()
  }

  /** Start the continuous audio dedup of `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, baseDir: String, outDir: String,
                  checkpoint: String, maxHamming: Int = 7): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, baseDir, outDir, maxHamming)
      }
      .start()
}
