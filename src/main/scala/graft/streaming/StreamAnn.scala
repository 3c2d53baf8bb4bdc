package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Similarity

/** CONTINUOUS similarity serving: each arriving micro-batch of query
  * vectors probes the static-quantizer IVF index of a (static) corpus
  * and appends its per-query top-k — the online half of the ANN family
  * (the index the batch operators build, queried as vectors arrive:
  * embedding-based retrieval, online near-dup checks, hard-negative
  * lookups during training).
  *
  * Composition, not new machinery: the micro-batch body IS the proven
  * [[Similarity.annServe]] (same cell probe, same bounded TopKByScore
  * ranking the oracles check), so the streaming decisions equal the
  * batch operator on the same rows — StreamingSpec proves it. The
  * query side of every probe join is the micro-batch (broadcast by
  * construction); the corpus-sized side only streams through the cell
  * equi-join, so ingest cost is proportional to arriving queries, not
  * to the corpus. The trained model (centroid matrix) is a broadcast
  * constant exactly as in the batch path — at deployment the
  * `foreachBatch` body swaps parquet appends for the serving store.
  */
object StreamAnn {

  /** Serve one micro-batch of (vec_id, embedding) queries against the
    * corpus dir; append the per-query top-k to `outDir`. */
  private[streaming] def applyBatch(batch: DataFrame, corpusDir: String,
                                    outDir: String, nProbe: Int,
                                    k: Int): Unit = {
    val spark = batch.sparkSession
    Similarity.annServe(spark, corpusDir, batch, nProbe, k)
      .write.mode("append").parquet(outDir)
  }

  /** Start continuous serving of `queries` (needs vec_id, embedding). */
  def applyStream(queries: DataFrame, corpusDir: String, outDir: String,
                  checkpoint: String, nProbe: Int = 4,
                  k: Int = 5): StreamingQuery =
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, corpusDir, outDir, nProbe, k)
      }
      .start()
}
