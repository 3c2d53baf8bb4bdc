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
      s"""# Bench run order (decodes the per-query bench vectors)
         |
         |Bench prints two machine lines after the human log:
         |
         |1. the DECIMAL line — `"v_cs":[..]` per-query CENTISECONDS
         |   (-1 = errored) plus `aq_cpu_cs`/`aq_gc_ms`/`aq_sh_mb`
         |   adjudicator vectors, full precision, for builder-side logs
         |   (too long to survive the driver's 2000-char tail);
         |2. the FINAL tail-safe "g1" line — the same vectors re-encoded
         |   (Bench.TailCodec): `w` (wall) and `cpu` are 2 chars/query,
         |   base36 of round(90·ln(1+centiseconds)) (decode
         |   e^(code/90)−1, ±~0.6%; `zz` = errored); `gc` (task GC ms)
         |   and `sh` (shuffle MB) are 1 char/query, base36 of
         |   round(log2(1+v)) (decode 2^code; `z` = errored).
         |   `dev/scaling.py` decodes both forms.
         |
         |Entry `i` (0-based, 2i..2i+1 for the 2-char vectors) below
         |names query `i`; `fp`/`order_fp` is md5-8 of this list, so a
         |decoder can refuse a vintage mismatch. Regenerate with
         |`sbt "runMain graft.tools.DumpBenchOrder"`; BenchOrderSpec
         |fails if this file and `Bench.benchOrder()` disagree.
         |
         |${names.zipWithIndex.map { case (n, i) => s"$i. $n" }.mkString("\n")}
         |""".stripMargin
    Files.writeString(Paths.get("docs/BENCH_ORDER.md"), body)
    println(s"wrote docs/BENCH_ORDER.md (${names.size} queries)")
  }
}
