package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Source-level lint pinning every UNPARTITIONED window in the engine
  * to an explicit bounded-frame allowlist.
  *
  * Why a lint and not a runtime marker: WindowExec warns ("No Partition
  * Defined ... single partition") whenever a window has no partition
  * spec, and Catalyst constant-folds a `partitionBy(lit(0))` marker
  * away before the physical plan — so the warning cannot be silenced
  * per-site without changing semantics. The repo's doctrine is that a
  * single-partition window is acceptable ONLY over frames bounded by
  * model/report state (a top-k head, a value histogram, a day table),
  * never over row-scale data. This spec makes that doctrine enforced:
  * any NEW `Window.orderBy`/`Window.rowsBetween`/`Window.rangeBetween`
  * chain (the house style for partitioned windows always starts
  * `Window.partitionBy(...)`) fails the build until it is either
  * partitioned or consciously added here with its boundedness argument.
  * The ~18 WindowExec warnings in a Verify log all map to these sites.
  */
class WindowLintSpec extends org.scalatest.funsuite.AnyFunSuite {

  /** (file → expected count) of unpartitioned Window chain-starts, each
    * justified bounded:
    *  - Curation.scala (1): rankedBy — ranks a bounded top-k retrieval
    *    list (≤ 20 rows) for reciprocal-rank fusion.
    *  - TextAnalysis.scala (2): vocab_coverage's rank + cumulative-share
    *    windows run AFTER `.limit(k)` — ≤ k rows (top-k head).
    *  - Quality.scala (3): corpus_concentration's two cumulative
    *    windows over the doc-length HISTOGRAM (≤ longest-doc rows) and
    *    benford_check's total over ≤ 9 digit rows.
    *  - Analytics.scala (1): events_cusum's prefix-sum window over the
    *    per-day rollup (|days| rows — the corpus pass is the partial
    *    aggregate that builds it). */
  private val allow = Map(
    "operators/TextAnalysis.scala" -> 2,
    "operators/Curation.scala" -> 1,
    "operators/Quality.scala" -> 3,
    "operators/Analytics.scala" -> 1)

  test("every unpartitioned Window chain is on the bounded allowlist") {
    val root = Paths.get("src/main/scala/graft")
    val pat = java.util.regex.Pattern.compile(
      """Window\s*\.\s*(orderBy|rowsBetween|rangeBetween)\(""")
    val walk = Files.walk(root)
    val found =
      try walk.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .flatMap { p =>
          val text = new String(Files.readAllBytes(p), "UTF-8")
          // frame-bound constants (Window.unboundedPreceding etc.) are
          // not chain starts; the pattern above already excludes them
          val m = pat.matcher(text)
          var n = 0
          while (m.find()) n += 1
          if (n > 0) Some(root.relativize(p).toString -> n) else None
        }.toMap
      finally walk.close()
    assert(found == allow,
      s"unpartitioned Window sites changed.\n  found: $found\n  " +
        s"allow: $allow\nA new single-partition window must either be " +
        "partitioned or argued bounded and added to the allowlist " +
        "with its justification.")
  }
}
