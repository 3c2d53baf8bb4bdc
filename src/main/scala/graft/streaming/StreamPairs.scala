package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** §2 #152 — CONTINUOUS verified-pair-artifact maintenance: every
  * arriving micro-batch of documents contributes exactly the pairs it
  * adds ([[graft.operators.Dedup.incrementalPairsFrom]] — probe side is
  * the batch only), appended to the same (id_a, id_b, j4) parquet
  * artifact [[graft.operators.Dedup.verifiedPairsToDir]] writes, then
  * the batch joins the accumulated corpus. The artifact therefore stays
  * CURRENT as the corpus grows: after any prefix of batches it equals a
  * full [[graft.operators.Dedup.dedupNgramExactjoinFrom]] rebuild on
  * the documents seen so far (pairwise Jaccard makes history pairs
  * invariant under appends — the same theorem DedupPairsSpec pins for
  * the batch form), so every *FromPairs audit can run off it at any
  * moment without a corpus-scale join.
  *
  * Composition, not new machinery: the `foreachBatch` body is the batch
  * operator; on a lakehouse the two appends become APPEND commits in
  * one transaction (docs/LAKEHOUSE.md). StreamingSpec proves the
  * replayed artifact equals the full rebuild.
  */
object StreamPairs {

  /** Append one micro-batch's new pairs and the batch itself.
    * Single-writer atomicity stance as StreamUpsert/StreamDedup. */
  private[streaming] def applyBatch(batch: DataFrame, corpusDir: String,
                                    pairsDir: String, tau: Double): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text"))
    val base =
      if (Files.exists(Paths.get(corpusDir))) spark.read.parquet(corpusDir)
      else b.filter(lit(false))
    Dedup.incrementalPairsFrom(base, b, tau)
      .write.mode("append").parquet(pairsDir)
    b.write.mode("append").parquet(corpusDir)
  }

  /** Start continuous pair maintenance for `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, corpusDir: String, pairsDir: String,
                  checkpoint: String, tau: Double = 0.3): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, corpusDir, pairsDir, tau)
      }
      .start()
}
