package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** §2 #101 — CONTINUOUS corpus dedup: every arriving micro-batch of
  * documents is deduped (exact AND near) against the accumulated base
  * corpus with the proven incremental operator
  * ([[graft.operators.Dedup.incrementalFrom]]), decisions land in a
  * decision log, and the batch's survivors join the base — the
  * production shape of a training-corpus ingest that must never
  * re-pair the history with itself.
  *
  * Composition, not new machinery: the probe side of every pairing is
  * the micro-batch only (cost proportional to the increment), exactly
  * the property the batch operator's oracle proves.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay (the
  * [[StreamPairs]] stance, shared with [[StreamPhash]]/[[StreamWavFp]]):
  * decisions and surviving docs land in `batch_id=N` subdirectories
  * with mode(overwrite), and the base read for batch N excludes
  * partition N — a replayed batch overwrites its own output instead of
  * appending duplicate decisions or survivors, and a half-applied crash
  * state cannot make the batch pair against itself as history. On a
  * lakehouse deployment the two writes become MERGE/APPEND commits
  * (docs/LAKEHOUSE.md); the `foreachBatch` body is the only seam.
  */
object StreamDedup {

  /** Dedup one micro-batch (keyed by `batchId`) against the accumulated
    * base; write decisions and surviving docs into the batch's own
    * partition. private[graft]: StreamingSpec drives it directly to
    * prove replay idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                baseDir: String, outDir: String,
                                tau: Double): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // replay of a compaction-folded batch: survivors and decisions are
    // already in the folded partitions — skip (older ids fail loudly)
    if (StreamIO.foldedByCompaction(baseDir, batchId, conf)
        || StreamIO.foldedByCompaction(outDir, batchId, conf)) return
    val b = batch.select(col("doc_id"), col("text"))
    val base = StreamPairs.readAccumulated(spark, baseDir)
      .map(_.filter(col("batch_id") =!= batchId)
        .select(col("doc_id"), col("text")))
      .getOrElse(b.filter(lit(false)))
    // persist: the decision frame feeds both the log write and the
    // survivor filter — without the cache the whole incremental-dedup
    // plan (prefix join included) would execute twice
    val decisions = Dedup.incrementalFrom(base, b, tau)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    decisions.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    b.join(decisions.filter(col("decision") === "kept").select("doc_id"),
        "doc_id")
      .write.mode("overwrite").parquet(s"$baseDir/batch_id=$batchId")
    decisions.unpersist()
    ()
  }

  /** Start the continuous dedup of `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, baseDir: String, outDir: String,
                  checkpoint: String, tau: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, baseDir, outDir, tau)
      }
      .start()
}
