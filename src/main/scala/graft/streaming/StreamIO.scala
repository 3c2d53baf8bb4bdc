package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** Shared filesystem probes for the foreachBatch components that keep
  * parquet state between micro-batches. Centralized because the
  * original per-object idiom (`Files.list(p).anyMatch(...)` with no
  * close) leaked one directory file descriptor per micro-batch — fatal
  * for a long-running streaming query. */
object StreamIO {

  /** True when `dir` exists and holds at least one data file (not a
    * `_SUCCESS` marker or a hidden/CRC file) — i.e. a parquet read of
    * the dir will see rows. The directory stream is closed in all
    * paths. */
  def hasParquetData(dir: String): Boolean = {
    val p = Paths.get(dir)
    Files.exists(p) && {
      val s = Files.list(p)
      try s.anyMatch { f =>
        val n = f.getFileName.toString
        !n.startsWith("_") && !n.startsWith(".")
      } finally s.close()
    }
  }

  /** Recursive delete (used by the stage→swap overwrite pattern). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally s.close()
    }
}
