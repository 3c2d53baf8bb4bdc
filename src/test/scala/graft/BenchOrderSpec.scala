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

  test("g1 tail codec: log roundtrip precision and sentinel handling") {
    import Bench.TailCodec._
    // 2-char codes: ±~0.6% relative (rounding half-step of e^(1/90))
    Seq(0.0, 1.0, 7.0, 42.0, 100.0, 870.0, 3174.0, 55079.0, 1.7e6)
      .foreach { v =>
        val s = enc2(v)
        assert(s.length == 2 && s != Err2, s"$v encoded $s")
        val d = dec2(s).get
        assert(math.abs(d - v) <= math.max(0.012 * v, 0.8),
          s"enc2/dec2 $v -> $d")
      }
    assert(dec2(Err2).isEmpty, "zz must decode as the error sentinel")
    assert(enc2(1e12) != Err2, "clamped max must not collide with Err2")
    // 1-char codes: factor-2 buckets
    assert(dec1('0').contains(0L))
    assert(dec1(Err1.head).isEmpty)
    Seq(1L, 10L, 23L, 1000L, 7800L, 999999L).foreach { v =>
      val d = dec1(enc1(v).head).get
      assert(d >= v / 2 && d <= v * 2 + 1, s"enc1/dec1 $v -> $d")
    }
    // the flat-vs-big contract: 20 ms GC and 7.8 s GC are far apart
    assert(dec1(enc1(7800L).head).get / dec1(enc1(20L).head).get >= 64,
      "a 390x outlier must span many buckets")
  }

  test("the tail-safe final line fits the driver's 2000-char window") {
    val names = Bench.benchOrder()
    // worst plausible widths everywhere: max-clamped vectors, wide
    // totals, a long retry query name, full-width probes
    val wallCs = names.map(_ -> 1.7e6).toMap
    val adj = names.map(_ -> ((999999L * 10000000L, 9999999L,
      999999L * 1000000L))).toMap
    val fam = Bench.families.map(_._1 -> 99999.9)
    // three retry slots since r14 (outliers arrive as a family), each
    // with a worst-plausible-width query name
    val retries = Seq(
      ("dedup_survivorship_composed", 9999999L, 9999999L),
      ("leakage_safe_split_composed", 9999999L, 9999999L),
      ("media_wav_fp_incremental", 9999999L, 9999999L))
    val line = Bench.TailCodec.buildLine(names, wallCs, adj, fam,
      retries,
      99.99, 99.99, 99999999L, "9999/9999+9999/9999+9999/9999>9999+9999+9999",
      99, 99999.9, "docs/BENCH_ORDER.md", "ffffffff")
    assert(!line.contains("\n"), "tail line must be a single line")
    assert(line.length <= 1800,
      s"tail line ${line.length} chars — the driver window keeps 2000" +
        " minus the sbt [success] trailer; 1800 is the budget")
    // the compact retry form (r18): order-index + two g1 codes per
    // slot, errored retry = the zz sentinel
    val retryS = "\"retry\":\"([^\"]*)\"".r
      .findFirstMatchIn(line).get.group(1)
    retryS.split(";").foreach { slot =>
      assert(slot.matches("i\\d+\\|[0-9a-z]{2}\\|[0-9a-z]{2}"), slot)
    }
    val errLine = Bench.TailCodec.buildLine(names, wallCs, adj, fam,
      Seq(("dedup_exact", 9999999L, -100L)),
      99.99, 99.99, 99999999L, "x", 99, 99999.9, "o", "ffffffff")
    assert(errLine.contains(s"i${names.indexOf("dedup_exact")}|"),
      "retry slot must carry the order index")
    assert("\"retry\":\"([^\"]*)\"".r.findFirstMatchIn(errLine).get
      .group(1).endsWith("|zz"), "errored retry must be the zz sentinel")
    // the four vectors decode to exactly one entry per query
    val w = "\"w\":\"([0-9a-z]+)\"".r.findFirstMatchIn(line).get.group(1)
    assert(w.length == names.size * 2, "wall vector is 2 chars/query")
    val gc = "\"gc\":\"([0-9a-z]+)\"".r.findFirstMatchIn(line).get.group(1)
    assert(gc.length == names.size, "gc vector is 1 char/query")
  }
}
