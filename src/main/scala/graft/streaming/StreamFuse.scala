package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{Curation, Similarity}

/** CONTINUOUS HYBRID (BM25 + vector) RETRIEVAL — the streaming twin of
  * [[graft.operators.Curation.retrievalFuseServed]] (VERDICT-r18 #6):
  * each arriving micro-batch of query vectors probes the IVF index
  * artifact for its vector lists, the deployment's fixed term query is
  * answered once per batch from the BM25 stats artifact's pruned
  * postings, and the two lists fuse per query with the reciprocal-rank
  * combine — the RAG serving loop closed off the two artifacts the way
  * [[StreamAnn]] closed it for pure ANN.
  *
  * Composition, not new machinery: the micro-batch body IS
  * [[Curation.bm25FromIndex]] + [[Similarity.annServeFromIndex]] +
  * [[Curation.rrfFuseByQuery]] — the same probes and the same combine
  * arithmetic the batch oracles check, so each batch's fused table
  * equals the batch fusion on the same query rows (StreamingSpec
  * proves it). Per-batch cost touches NO corpus-scale frame: the
  * lexical leg reads only the query terms' posting row-groups, the
  * vector leg only the probed cells, the fuse only two bounded lists
  * per query.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay (the
  * [[StreamPairs]] stance): each batch's fused top-k lands in its own
  * `batch_id=N` partition with mode(overwrite). Same maintenance
  * concurrency caveat as [[StreamAnn.applyStreamFromIndex]].
  */
object StreamFuse {

  /** Fuse one micro-batch of (vec_id, embedding) queries. An idle
    * micro-batch writes nothing (the idle-batch stance). private[graft]:
    * StreamingSpec drives it directly to prove replay idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                bm25Dir: String, indexDir: String,
                                terms: Seq[String], outDir: String,
                                nProbe: Int, kLeg: Int, k: Int): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val lex = Curation.rankedBy(
      Curation.bm25FromIndex(spark, bm25Dir, terms, kLeg), col("score"))
    val vec = Similarity.annServeFromIndex(spark, indexDir, batch,
        nProbe, kLeg)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rnk").as("rank"))
    // the batch's FULL query set rides along: a query whose probe
    // found nothing still gets its lex-only fused list
    Curation.rrfFuseByQuery(lex, vec, k = k,
        queryIds = Some(batch.select(col("vec_id").as("query_id"))))
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** Start continuous fused serving of `queries` (needs vec_id,
    * embedding) off the two artifacts. */
  def applyStreamFromIndexes(queries: DataFrame, bm25Dir: String,
                             indexDir: String, terms: Seq[String],
                             outDir: String, checkpoint: String,
                             nProbe: Int = 4, kLeg: Int = 20,
                             k: Int = 10): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, bm25Dir, indexDir, terms, outDir,
          nProbe, kLeg, k)
      }
      .start()
}
