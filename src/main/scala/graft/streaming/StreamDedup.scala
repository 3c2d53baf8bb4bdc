package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** §2 #101 — CONTINUOUS corpus dedup: every arriving micro-batch of
  * documents is deduped (exact AND near) against the accumulated base
  * corpus with the proven incremental operator
  * ([[graft.operators.Dedup.incrementalFrom]]), decisions are appended
  * to a decision log, and the batch's survivors join the base — the
  * production shape of a training-corpus ingest that must never
  * re-pair the history with itself.
  *
  * Composition, not new machinery: the probe side of every pairing is
  * the micro-batch only (cost proportional to the increment), exactly
  * the property the batch operator's oracle proves. On a lakehouse
  * deployment the two parquet appends become MERGE/APPEND commits
  * (docs/LAKEHOUSE.md); the `foreachBatch` body is the only seam.
  */
object StreamDedup {

  /** Dedup one micro-batch against the base dir; append decisions and
    * surviving docs. Single-writer atomicity stance as StreamUpsert. */
  private[streaming] def applyBatch(batch: DataFrame, baseDir: String,
                                    outDir: String, tau: Double): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text"))
    // `Files.exists` alone is not enough: a pre-created EMPTY directory
    // (ExportImport.scratch eagerly mkdirs) would make read.parquet
    // throw on the first batch — require actual data files
    val hasData = StreamIO.hasParquetData(baseDir)
    val base =
      if (hasData) spark.read.parquet(baseDir)
      else b.filter(lit(false))
    // persist: the decision frame feeds both the log append and the
    // survivor filter — without the cache the whole incremental-dedup
    // plan (prefix join included) would execute twice
    val decisions = Dedup.incrementalFrom(base, b, tau)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    decisions.write.mode("append").parquet(outDir)
    b.join(decisions.filter(col("decision") === "kept").select("doc_id"),
        "doc_id")
      .write.mode("append").parquet(baseDir)
    decisions.unpersist()
  }

  /** Start the continuous dedup of `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, baseDir: String, outDir: String,
                  checkpoint: String, tau: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, baseDir, outDir, tau)
      }
      .start()
}
