package graft.streaming

import org.apache.spark.sql.SparkSession

/** ARTIFACT COMPACTION / delta GC — the maintenance half of the
  * artifact doctrine: every foreachBatch maintainer on the
  * [[StreamPairs]] stance accumulates one `batch_id=N` partition per
  * non-idle micro-batch, forever. Correctness never degrades (readers
  * union the partitions), but after 10⁴ micro-batches the partition
  * listing itself becomes the scan bottleneck and per-partition files
  * shrink toward the small-file pathology. `compactBatched` folds the
  * whole accumulation into ONE partition keyed by the max folded batch
  * id, restoring O(1) listing and full-size files — the non-lakehouse
  * analog of OPTIMIZE/rewrite_data_files (on Delta/Iceberg this whole
  * object is a table service; docs/LAKEHOUSE.md).
  *
  * SINGLE-WRITER contract: run while the maintaining stream is STOPPED
  * (between runs, after its checkpoint committed) — the same quiescence
  * every non-transactional table maintenance requires. Two guards make
  * violations loud rather than corrupting:
  *  - the fold commits a `_compacted_through` marker INSIDE the swapped
  *    dir (atomic with the data, the [[StreamSketches]] stance);
  *  - every maintainer checks it on entry
  *    ([[StreamIO.foldedByCompaction]]): a replay of the last folded
  *    batch SKIPS (its rows are already in the folded base — the
  *    at-least-once case of a stop that crashed before the checkpoint
  *    commit), and anything older fails loudly as a reset checkpoint.
  *
  * Crash-safety of the compaction itself: the staged dir carries data +
  * marker and is swapped in via delete→rename, with
  * [[StreamIO.recoverInterruptedSwap]] on entry repairing a crash
  * between the two — identical to the sketch-state swap discipline.
  *
  * Concurrent READERS (distinct from the quiesced-MAINTAINER contract
  * above): the delete→rename window momentarily removes the dir, so a
  * scan planned across it can see missing files — set
  * `spark.sql.files.ignoreMissingFiles` for in-flight reads, or put
  * serving that cannot tolerate the window behind an ACID table format
  * (docs/LAKEHOUSE.md). A read started after the swap is always
  * complete.
  */
object Compaction {

  /** Fold every `batch_id=N` partition of a [[StreamPairs]]-stance
    * accumulation dir (pairs, corpus, fingerprint bases, decision
    * logs) into the single partition `batch_id=W` (W = max folded id).
    * Readers see identical rows before and after — `batch_id` values
    * collapse to W, which is why decision/provenance consumers that
    * need per-batch lineage should compact only their base artifacts.
    * Returns the folded watermark; None when the dir has ≤ 1 partition
    * (nothing to fold). Idempotent: re-running after a crash at any
    * point completes or no-ops. */
  def compactBatched(spark: SparkSession, dir: String): Option[Long] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val staged = dir + ".compact-staging"
    StreamIO.recoverInterruptedSwap(dir, staged, "_compacted_through", conf)
    // A crash between the staged write and the swap leaves a stale
    // staging dir whose batch_id=w1 partition would survive the next
    // run's overwrite of batch_id=w2 (w2 > w1 once new batches landed)
    // and be installed alongside it, duplicating every row through w1.
    // Clear the staging root so each attempt stages from scratch.
    StreamIO.deleteRecursively(staged, conf)
    val (fs, p) = StreamIO.fsFor(dir, conf)
    if (!fs.exists(p)) return None
    val parts = fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
    if (parts.length <= 1) return None
    val w = parts.max
    // one pass: read the partition union, drop the partition column,
    // land everything as the single watermark partition in staging
    spark.read.parquet(dir).drop("batch_id")
      .write.mode("overwrite").parquet(s"$staged/batch_id=$w")
    StreamIO.writeMarker(staged, "_compacted_through", w, conf)
    StreamIO.swapInto(staged, dir, conf)
    Some(w)
  }
}
