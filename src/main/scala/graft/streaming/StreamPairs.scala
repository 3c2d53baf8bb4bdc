package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** §2 #152 — CONTINUOUS verified-pair-artifact maintenance: every
  * arriving micro-batch of documents contributes exactly the pairs it
  * adds ([[graft.operators.Dedup.incrementalPairsUnordered]] — probe
  * side is the batch only), written to the (id_a, id_b, j4) parquet
  * artifact, then the batch joins the accumulated corpus. The artifact
  * therefore stays CURRENT as the corpus grows: after any prefix of
  * batches it equals a full
  * [[graft.operators.Dedup.dedupNgramExactjoinFrom]] rebuild on the
  * documents seen so far (pairwise Jaccard makes history pairs
  * invariant under appends — the theorem DedupPairsSpec pins for the
  * batch form), so every *FromPairs audit can run off it at any moment
  * without a corpus-scale join.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay: both writes
  * land in a `batch_id=N` subdirectory with mode(overwrite), so a
  * replayed batch overwrites its own partition instead of appending a
  * duplicate — the idempotence parquet `append` cannot offer. Readers
  * see `batch_id` as a partition column; select it away when the
  * artifact schema must be exactly (id_a, id_b, j4).
  *
  * Composition, not new machinery: the `foreachBatch` body is the batch
  * operator; on a lakehouse the two writes become APPEND commits in one
  * transaction (docs/LAKEHOUSE.md). StreamingSpec proves the replayed
  * artifact equals the full rebuild AND that a re-run batch does not
  * duplicate pairs.
  */
object StreamPairs {

  /** Read a partitioned accumulation dir that may not have data yet —
    * a bare existence probe is not enough: scratch() pre-creates empty
    * directories, and spark.read.parquet on one throws. Resolves
    * through the Hadoop FileSystem of the dir's scheme ([[StreamIO]])
    * so the accumulated artifact can live on a DFS. */
  private[streaming] def readAccumulated(spark: org.apache.spark.sql.SparkSession,
                                         dir: String): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val (fs, p) = StreamIO.fsFor(dir, conf)
    val hasData = fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith("batch_id="))
    if (hasData) Some(spark.read.parquet(dir)) else None
  }

  /** Apply one micro-batch idempotently (keyed by `batchId`).
    * private[graft]: StreamingSpec drives it directly to prove replay
    * idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                    corpusDir: String, pairsDir: String,
                                    tau: Double): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // a replay of the last compaction-folded batch must skip BOTH
    // writes (its pairs and docs are already in the folded partitions);
    // an older id fails loudly (StreamIO.foldedByCompaction)
    if (StreamIO.foldedByCompaction(corpusDir, batchId, conf)
        || StreamIO.foldedByCompaction(pairsDir, batchId, conf)) return
    val b = batch.select(col("doc_id"), col("text"))
    // the accumulated corpus EXCLUDES this batch id: on a replay the
    // half-applied state (pairs written, corpus not, or both written)
    // must not make the batch pair against itself as "history"
    val base = readAccumulated(spark, corpusDir)
      .map(_.filter(col("batch_id") =!= batchId)
        .select(col("doc_id"), col("text")))
      .getOrElse(b.filter(lit(false)))
    Dedup.incrementalPairsUnordered(base, b, tau)
      .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
    b.write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
  }

  /** Start continuous pair maintenance for `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, corpusDir: String, pairsDir: String,
                  checkpoint: String, tau: Double = 0.3): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, corpusDir, pairsDir, tau)
      }
      .start()
}
