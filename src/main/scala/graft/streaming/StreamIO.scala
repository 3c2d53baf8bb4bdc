package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Shared filesystem plumbing for the foreachBatch components that keep
  * parquet state between micro-batches: existence probes, recursive
  * delete, the applied-batch marker, and the stage→swap commit.
  *
  * Everything resolves through `org.apache.hadoop.fs.FileSystem` of the
  * path's scheme (the artifact readers moved there in round 13 —
  * [[graft.operators.Sketches.readSketchStates]] etc.): the state dirs
  * these writers maintain are exactly what a 100 TB deployment keeps
  * current per micro-batch, and they live on HDFS/S3, where a
  * `java.nio.file` probe rejects the URI outright. Centralized because
  * the original per-object idiom (`Files.list(p).anyMatch(...)` with no
  * close) leaked one directory file descriptor per micro-batch — fatal
  * for a long-running streaming query.
  */
object StreamIO {

  /** Resolve `dir` to its scheme's FileSystem under `conf` (pass the
    * session's `sparkContext.hadoopConfiguration` so cluster
    * credentials/settings apply). */
  def fsFor(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  /** True when `dir` exists and holds at least one data entry (not a
    * `_SUCCESS` marker or a hidden/CRC file) — i.e. a parquet read of
    * the dir will see rows. `listStatus` is a single RPC; no stream to
    * leak. */
  def hasParquetData(dir: String, conf: Configuration): Boolean = {
    val (fs, p) = fsFor(dir, conf)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Recursive delete (used by the stage→swap overwrite pattern). */
  def deleteRecursively(dir: String, conf: Configuration): Unit = {
    val (fs, p) = fsFor(dir, conf)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Read the long stored in the underscore-prefixed marker file
    * `dir/name` (invisible to parquet readers, like `_SUCCESS`);
    * None when dir or marker is absent. */
  def readMarker(dir: String, name: String,
                 conf: Configuration): Option[Long] = {
    val (fs, p) = fsFor(dir, conf)
    val m = new Path(p, name)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      try {
        // InputStream.read may legally return fewer bytes than are
        // available (DFS short read) — loop to EOF before parsing.
        val buf = new java.io.ByteArrayOutputStream(64)
        val bytes = new Array[Byte](64)
        var n = in.read(bytes)
        while (n > 0) { buf.write(bytes, 0, n); n = in.read(bytes) }
        Some(new String(buf.toByteArray, "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** Write `value` into the marker file `dir/name` (overwrite). */
  def writeMarker(dir: String, name: String, value: Long,
                  conf: Configuration): Unit = {
    val (fs, p) = fsFor(dir, conf)
    val out = fs.create(new Path(p, name), true)
    try out.write(value.toString.getBytes("UTF-8"))
    finally out.close()
    ()
  }

  /** Commit a completed staged write: delete `target`, rename `staged`
    * into its place. Single-writer pipelines only — the swap is two FS
    * operations, so a crash BETWEEN them leaves target missing and the
    * staged copy intact; [[recoverInterruptedSwap]] must run on the
    * next entry before anything reads `target`. */
  def swapInto(staged: String, target: String, conf: Configuration): Unit = {
    val (fs, t) = fsFor(target, conf)
    if (fs.exists(t)) fs.delete(t, true)
    if (!fs.rename(new Path(staged), t))
      throw new java.io.IOException(
        s"stage swap failed: rename $staged -> $target")
  }

  /** Compaction guard for the `batch_id=N` overwrite stance: after
    * [[Compaction.compactBatched]] (or
    * [[graft.operators.Similarity.ivfIndexCompact]]) folded partitions
    * through watermark W (recorded in the artifact's
    * `_compacted_through` marker), a maintainer receiving batch W again
    * is the single legitimate replay — its rows are already in the
    * folded base, so the whole micro-batch body must be SKIPPED (an
    * overwrite of the folded partition would replace the entire history
    * with one batch). A batch id STRICTLY below W can only mean a reset
    * checkpoint running against a live artifact — silently skipping
    * would drop every batch, so that fails loudly (the
    * [[StreamSketches]] stance). Returns true = skip this batch. */
  def foldedByCompaction(dir: String, batchId: Long,
                         conf: Configuration): Boolean =
    readMarker(dir, "_compacted_through", conf) match {
      case Some(w) if batchId == w => true
      case Some(w) if batchId < w =>
        throw new IllegalStateException(
          s"artifact at $dir is compacted through batch $w but this " +
            s"query is at batch $batchId — the checkpoint was reset " +
            "against a live artifact; an overwrite would destroy the " +
            "folded history. Point the query at a fresh artifact or " +
            "restore the original checkpoint.")
      case _ => false
    }

  /** Complete a [[swapInto]] interrupted between its delete and its
    * rename: if `target` is gone but `staged` still holds a COMPLETE
    * copy (witnessed by `completeMarker`, written strictly after the
    * data files — `_SUCCESS` for plain Spark writes, `_applied_batch`
    * for marker-carrying artifacts), move it into place. Without this,
    * a replayed batch would see "no prior state" and silently rebuild
    * from the replayed rows alone, collapsing the accumulated artifact
    * (ADVICE r13). Returns true when a recovery happened. */
  def recoverInterruptedSwap(target: String, staged: String,
                             completeMarker: String,
                             conf: Configuration): Boolean = {
    val (fs, t) = fsFor(target, conf)
    val s = new Path(staged)
    if (!fs.exists(t) && fs.exists(s)
        && fs.exists(new Path(s, completeMarker))) {
      if (!fs.rename(s, t))
        throw new java.io.IOException(
          s"swap recovery failed: rename $staged -> $target")
      true
    } else false
  }
}
