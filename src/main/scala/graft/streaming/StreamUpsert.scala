package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.MergeImport

/** §2 #64 — streaming CDC apply: a stream of keyed record versions is
  * merged into a parquet target with latest-version-wins semantics,
  * one micro-batch at a time (`foreachBatch` + the SAME batch upsert
  * the import path uses — Codeunit 60000:419's apply loop as a
  * continuous process).
  *
  * Without a transactional table format, atomicity comes from the
  * write-to-staging + directory-swap pattern: readers never observe a
  * half-written target. With Delta/Iceberg the `foreachBatch` body
  * becomes a MERGE INTO and everything else stays identical — that
  * boundary is exactly the `applyBatch` function.
  */
object StreamUpsert {

  /** Merge one micro-batch into the parquet dir at `target`. */
  private[streaming] def applyBatch(batch: DataFrame, target: String,
                                    key: String): Unit = {
    val spark = batch.sparkSession
    val tPath = Paths.get(target)
    val merged =
      if (Files.exists(tPath))
        MergeImport.upsert(spark.read.parquet(target), batch, key)
      else batch
    // stage → swap: the target dir is replaced atomically enough for a
    // single-writer pipeline; a crash mid-swap leaves the staged copy
    val staged = target + ".staging"
    merged.write.mode("overwrite").parquet(staged)
    StreamIO.deleteRecursively(tPath)
    Files.move(Paths.get(staged), tPath)
  }

  /** Start the continuous apply of `updates` (must contain `key`). */
  def applyStream(updates: DataFrame, target: String, key: String,
                  checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, target, key)
      }
      .start()
}
