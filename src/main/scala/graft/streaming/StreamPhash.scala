package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Blob

/** §2 #201d — CONTINUOUS image near-dup ingest: every arriving
  * micro-batch of image documents is fingerprinted (real PNG
  * encode/decode → dHash) and deduped against the accumulated base
  * FINGERPRINT table with the proven incremental operator
  * ([[graft.operators.Blob.mediaPhashIncrementalFrom]]); decisions are
  * appended to a log and the batch's kept fingerprints join the base —
  * the image twin of [[StreamDedup]].
  *
  * The economics are the point: the base state is 8 bytes/image (the
  * fingerprint), never the image bytes — a 100 TB image corpus keeps a
  * few GB of hot state, each batch decodes only ITS OWN images
  * (map-only), and the band join probes with the batch side only, so
  * per-batch cost ∝ increment.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay (the
  * [[StreamPairs]] stance): decisions and kept fingerprints land in
  * `batch_id=N` subdirectories with mode(overwrite), and the base read
  * for batch N EXCLUDES partition N — so a replayed batch overwrites
  * its own output instead of appending duplicates, and a half-applied
  * crash state cannot make the batch pair against itself as history.
  * On a lakehouse deployment the two writes become APPEND commits in
  * one transaction (docs/LAKEHOUSE.md); `foreachBatch` is the only
  * seam.
  */
object StreamPhash {

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
    // cache the fingerprint mapPartitions (PNG encode + decode per
    // image) would run twice
    val decisions = Blob.mediaPhashIncrementalFrom(base, b, maxHamming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    decisions.select("doc_id", "decision")
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    decisions.filter(col("decision") === "kept")
      .select("doc_id", "fp")
      .write.mode("overwrite").parquet(s"$baseDir/batch_id=$batchId")
    decisions.unpersist()
    ()
  }

  /** Start the continuous image dedup of `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, baseDir: String, outDir: String,
                  checkpoint: String, maxHamming: Int = 7): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, baseDir, outDir, maxHamming)
      }
      .start()
}
