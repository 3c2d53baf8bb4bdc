package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Curation

/** CONTINUOUS BM25 stats maintenance — the lexical twin of
  * [[StreamIvfIndex]]: each arriving micro-batch of new documents lands
  * its postings and its 1-row meta increment as the batch's own
  * `batch_id=N` subtrees of the stats artifact
  * ([[Curation.bm25StatsToDir]]), so [[Curation.bm25FromIndex]] — and
  * therefore the continuous fused serving loop ([[StreamFuse]]) — sees
  * continuously-ingested documents with no code change. With
  * [[StreamIvfIndex]] maintaining the vector leg and this maintainer
  * the lexical one, BOTH halves of the hybrid retrieval artifact pair
  * stay live under document ingest.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay (the
  * [[StreamPairs]] stance): [[Curation.bm25StatsAppend]] overwrites the
  * batch's own subtrees, so a replayed batch replaces its delta instead
  * of double-counting documents. Per-batch cost ∝ increment: one pass
  * over the batch's documents; the base postings are never read or
  * rewritten. StreamingSpec proves serving from the maintained artifact
  * equals a full rebuild over the combined corpus, and that a replayed
  * batch leaves it unchanged.
  */
object StreamBm25Index {

  /** Land one micro-batch of (doc_id, text) documents (keyed by
    * `batchId`). An idle micro-batch lands nothing. private[graft]:
    * StreamingSpec drives it directly to prove replay idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                dir: String): Unit =
    Curation.bm25StatsAppend(batch.sparkSession, dir, batch, batchId)

  /** Start continuous maintenance of the stats artifact at `dir`
    * (built once by [[Curation.bm25StatsToDir]]); `docs` needs
    * (doc_id, text). */
  def start(docs: DataFrame, dir: String,
            checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, dir)
      }
      .start()
}
