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
  * per-batch cost ∝ increment. On a lakehouse deployment the two
  * parquet appends become APPEND commits (docs/LAKEHOUSE.md);
  * `foreachBatch` is the only seam.
  */
object StreamPhash {

  /** Dedup one micro-batch against the base fingerprint dir; append
    * decisions and kept fingerprints. Single-writer atomicity stance
    * as [[StreamUpsert]]. */
  private[streaming] def applyBatch(batch: DataFrame, baseDir: String,
                                    outDir: String, maxHamming: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text"))
    val hasData = StreamIO.hasParquetData(baseDir)
    val base =
      if (hasData) spark.read.parquet(baseDir)
      else spark.range(0).select(col("id").as("doc_id"),
        col("id").as("fp"))
    // persist: the decision frame feeds both the log append and the
    // kept-fingerprint append — without the cache the fingerprint
    // mapPartitions (PNG encode + decode per image) would run twice
    val decisions = Blob.mediaPhashIncrementalFrom(base, b, maxHamming)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    decisions.select("doc_id", "decision")
      .write.mode("append").parquet(outDir)
    decisions.filter(col("decision") === "kept")
      .select("doc_id", "fp")
      .write.mode("append").parquet(baseDir)
    decisions.unpersist()
    ()
  }

  /** Start the continuous image dedup of `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, baseDir: String, outDir: String,
                  checkpoint: String, maxHamming: Int = 7): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, baseDir, outDir, maxHamming)
      }
      .start()
}
