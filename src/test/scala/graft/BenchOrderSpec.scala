package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins docs/BENCH_ORDER.md (the decoder for the `v_cs` per-query
  * vector in Bench's truncation-proof final line) to the code: if the
  * headline set changes without regenerating the doc, this fails. */
class BenchOrderSpec extends AnyFunSuite {

  test("docs/BENCH_ORDER.md lists exactly Bench.benchOrder(), in order") {
    val path = java.nio.file.Paths.get("docs/BENCH_ORDER.md")
    assert(java.nio.file.Files.exists(path),
      "docs/BENCH_ORDER.md missing — run sbt \"runMain graft.tools.DumpBenchOrder\"")
    val listed = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala
      .flatMap { l =>
        "^(\\d+)\\. (\\S+)$".r.findFirstMatchIn(l)
          .map(m => (m.group(1).toInt, m.group(2)))
      }.toSeq
    val expected = Bench.benchOrder()
    assert(listed.map(_._2) == expected,
      "BENCH_ORDER.md out of date — run sbt \"runMain graft.tools.DumpBenchOrder\"")
    assert(listed.map(_._1) == expected.indices,
      "BENCH_ORDER.md indices must be 0-based and dense")
  }

  test("every headline query exists and every family name is unique") {
    val all = Bench.families.flatMap(_._2)
    assert(all.distinct == all, "duplicate query in Bench.families")
    val missing = all.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not in SparkEntry.queries: $missing")
  }
}
