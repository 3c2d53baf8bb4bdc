package graft.streaming

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

  /** Merge one micro-batch into the parquet dir at `target`. The
    * stage→swap runs through the Hadoop FileSystem of the target's
    * scheme ([[StreamIO]]) so the maintained table can live on a DFS,
    * and a crash between the swap's delete and rename is repaired on
    * the next entry (`_SUCCESS` witnesses a committed staged write;
    * the upsert itself is idempotent, so a replayed merge after
    * recovery converges to the same rows). */
  private[graft] def applyBatch(batch: DataFrame, target: String,
                                key: String): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val staged = target + ".staging"
    StreamIO.recoverInterruptedSwap(target, staged, "_SUCCESS", conf)
    val merged =
      if (StreamIO.hasParquetData(target, conf))
        MergeImport.upsert(spark.read.parquet(target), batch, key)
      else batch
    merged.write.mode("overwrite").parquet(staged)
    StreamIO.swapInto(staged, target, conf)
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
