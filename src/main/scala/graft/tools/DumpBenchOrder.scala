package graft.tools

import java.nio.file.{Files, Paths}

/** Regenerates docs/BENCH_ORDER.md — the name list that decodes the
  * `v_cs` per-query vector in Bench's truncation-proof final line.
  * BenchOrderSpec pins the committed file to [[graft.Bench.benchOrder]],
  * so an added/removed headline query fails the suite until this runs. */
object DumpBenchOrder {
  def main(args: Array[String]): Unit = {
    val names = graft.Bench.benchOrder()
    val body =
      s"""# Bench run order (decodes `v_cs` in the final bench line)
         |
         |`v_cs[i]` in Bench's compact final JSON line is the timing of
         |query `i` (0-based) below, in CENTISECONDS (-1 = errored).
         |Regenerate with `sbt "runMain graft.tools.DumpBenchOrder"`;
         |BenchOrderSpec fails if this file and `Bench.benchOrder()`
         |disagree.
         |
         |${names.zipWithIndex.map { case (n, i) => s"$i. $n" }.mkString("\n")}
         |""".stripMargin
    Files.writeString(Paths.get("docs/BENCH_ORDER.md"), body)
    println(s"wrote docs/BENCH_ORDER.md (${names.size} queries)")
  }
}
