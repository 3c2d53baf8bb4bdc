package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** CONTINUOUS exact kNN edge maintenance: each arriving micro-batch of
  * new corpus vectors is merged into the stored edge state through the
  * delta-proportional path ([[Similarity.knnEdgesIncrementalFull]] —
  * stored top-k ∪ broadcast-delta scores for existing nodes, one
  * streamed pass for the delta's own neighbors), so the graph the
  * consumers read (pagerank, communities, triangles) is always the
  * EXACT graph over everything ingested so far, and no micro-batch
  * ever pays the |corpus|² rebuild. The artifact keeps two legs under
  * `dir`:
  *  - `vectors/batch_id=N` — the accumulated streamed vectors
  *    (replay-idempotent overwrite partitions, the [[StreamPairs]]
  *    stance): the corpus side future merges score deltas against;
  *  - `edges/` — the current (src, dst, rnk, cos, mutual) state with
  *    FULL-precision scores (a 6-dp-rounded score cannot re-rank
  *    exactly against fresh doubles), committed by stage→swap with an
  *    `_applied_batch` marker INSIDE the swapped dir — the
  *    [[StreamSketches]] stance, because the merge is NOT idempotent
  *    (re-unioning an applied batch's candidates would duplicate
  *    them): a replay of the applied batch SKIPS, an older id fails
  *    loudly as a reset checkpoint, and an interrupted swap is
  *    repaired on entry.
  * Batch vectors land BEFORE the edge swap: a crash between the two
  * replays the merge against a corpus that already holds the batch
  * (the overwrite makes the vector landing idempotent), so the state
  * can never advance past its corpus.
  *
  * The vectors leg is a standard [[StreamPairs]]-stance accumulation,
  * so it takes the standard delta GC: [[Compaction.compactBatched]]
  * folds `vectors/` to one partition, and the edge-side
  * `_applied_batch` marker already guards every replay/reset case the
  * fold creates (a replay of a folded batch was by construction
  * already applied to the edges, so it skips before touching the
  * vectors) — StreamingSpec proves a post-GC merge still sees every
  * folded vector. `edges/` itself never needs GC: it is a single
  * swapped dir of ≤N×k rows.
  *
  * The first non-idle batch seeds the state with the one-time exact
  * build over seed ∪ batch ([[Similarity.knnEdgesFullFrom]] — the
  * same cell equi-join plan as the batch artifact); every later batch
  * pays cost ∝ increment. Delta vec_ids must be fresh (the
  * [[StreamIvfIndex]] ingest contract). StreamingSpec proves the
  * maintained state equals the from-scratch build after every prefix,
  * replay idempotence, and the reset refusal.
  */
object StreamKnnEdges {

  /** Merge one micro-batch (keyed by `batchId`) of (vec_id, embedding)
    * vectors into the edge state at `dir`, scoring against
    * `seedCorpus` ∪ previously accumulated batches. private[graft]:
    * StreamingSpec drives it directly. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                seedCorpus: DataFrame, dir: String,
                                k: Int): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val edgesDir = s"$dir/edges"
    val staged = edgesDir + ".staging"
    StreamIO.recoverInterruptedSwap(edgesDir, staged, "_applied_batch",
      conf)
    StreamIO.readMarker(edgesDir, "_applied_batch", conf) match {
      case Some(m) if batchId == m => return // replayed applied batch
      case Some(m) if batchId < m =>
        throw new IllegalStateException(
          s"edge state at $edgesDir is applied through batch $m but " +
            s"this query is at batch $batchId — the checkpoint was " +
            "reset against a live artifact; a re-merge would duplicate " +
            "every candidate. Point the query at a fresh artifact or " +
            "restore the original checkpoint.")
      case _ => ()
    }
    if (batch.isEmpty) return
    // vectors FIRST (idempotent overwrite), edges swap second: a crash
    // between the two re-merges against a corpus that already holds
    // the batch — the state can never advance past its corpus
    val accRoot = s"$dir/vectors"
    val own = s"$accRoot/batch_id=$batchId"
    batch.select("vec_id", "embedding")
      .write.mode("overwrite").parquet(own)
    val prior =
      if (StreamIO.hasParquetData(accRoot, conf))
        spark.read.parquet(accRoot)
          .filter(col("batch_id") =!= batchId)
          .select("vec_id", "embedding")
      else batch.select("vec_id", "embedding").limit(0)
    val corpus = seedCorpus.select("vec_id", "embedding")
      .unionByName(prior)
    val nextFull =
      if (StreamIO.hasParquetData(edgesDir, conf))
        Similarity.knnEdgesIncrementalFull(corpus,
          spark.read.parquet(edgesDir).select("src", "dst", "cos"),
          batch.select("vec_id", "embedding"), k)
      else
        // first batch: the one-time exact seed build
        Similarity.knnEdgesFullFrom(
          corpus.unionByName(batch.select("vec_id", "embedding")), k)
    Similarity.mutualFull(nextFull)
      .write.mode("overwrite").parquet(staged)
    StreamIO.writeMarker(staged, "_applied_batch", batchId, conf)
    StreamIO.swapInto(staged, edgesDir, conf)
  }

  /** Start continuous maintenance; `vectors` needs (vec_id,
    * embedding) with fresh ids, `seedCorpus` is the already-indexed
    * base the first merges score against. Read the maintained graph
    * from `dir/edges`. */
  def start(vectors: DataFrame, seedCorpus: DataFrame, dir: String,
            checkpoint: String, k: Int = 5): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, seedCorpus, dir, k)
      }
      .start()
}
