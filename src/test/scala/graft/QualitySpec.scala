package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkSpec {

  test("fk_orphans: exactly the children of thinned parents, via anti join") {
    val r = Quality.fkOrphans(spark, sf).collect().head
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 97 === 0).count()
    assert(r.getAs[Long]("n_orphan_lines") == expected)
    assert(r.getAs[Long]("n_orphan_keys") <= r.getAs[Long]("n_orphan_lines"))
    val plan = planOf(Quality.fkOrphans(spark, sf))
    assert(plan.contains("Anti"), plan)
  }

  test("deterministic_sample: stable membership, roughly pct-sized") {
    val a = Quality.deterministicSample(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    val b = Quality.deterministicSample(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(a == b, "sample must be identical across runs")
    val total = Tables.load(spark, sf, "orders").count()
    val frac = a.length.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"~10% expected, got $frac")
  }

  test("knuth32: equals the naive multiply in-range, stays finite past 2^32") {
    import spark.implicits._
    // in the naive formula's non-overflowing range the split multiply
    // must reproduce it bit-for-bit (no oracle churn from the fix)
    val small = Seq(0L, 1L, 7L, 65535L, 65536L, 123456789L, 2147483647L,
      3000000000L).toDF("k")
      .select(col("k"), Quality.knuth32(col("k")).as("h"),
        pmod(col("k") * 2654435761L, lit(4294967296L)).as("naive"))
      .collect()
    small.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
    // beyond ~3.4e9 the naive multiply overflows int64 (Spark wraps,
    // DuckDB raises); the split form must stay defined and in-range
    val huge = Seq(4294967296L, 1L << 40, Long.MaxValue).toDF("k")
      .select(Quality.knuth32(col("k")).as("h")).collect()
    huge.foreach { r =>
      val h = r.getLong(0)
      assert(h >= 0L && h < 4294967296L, s"out of range: $h")
    }
    // and match the mathematically exact (key mod 2^32) * A mod 2^32
    val exp = Seq(4294967296L, 1L << 40, Long.MaxValue).map { k =>
      (BigInt(k).mod(BigInt(2).pow(32)) * 2654435761L)
        .mod(BigInt(2).pow(32)).toLong
    }
    assert(huge.map(_.getLong(0)).toSeq == exp)
  }

  test("mixture/upsample hashes survive 100TB-scale doc ids without overflow") {
    import spark.implicits._
    val docs = Seq(
      (5000000000L, "src0", "alpha beta gamma"),
      ((1L << 40) + 17L, "src1", "delta epsilon"),
      (42L, "src2", "zeta eta theta iota")).toDF("doc_id", "source", "text")
    val up = operators.Curation.upsampleFrom(docs, Map("src0" -> 2))
      .collect()
    assert(up.length == 3)
    up.foreach { r =>
      val pos = r.getAs[Long]("first_pos")
      assert(pos >= 0L && pos < 4294967296L, s"pos out of range: $pos")
    }
    val mix = operators.Curation.mixtureFrom(docs, budgetTokens = 100L)
      .collect()
    assert(mix.length == 3)
  }

  test("l_diversity: a k-anonymous group sharing its sensitive value is risky") {
    import spark.implicits._
    // group A: 4 rows, all the same sensitive value (k-anonymous at
    // k=4 yet 1-diverse); group B: 3 rows, 3 distinct values
    val df = Seq(
      ("A", "x", 1L), ("A", "x", 1L), ("A", "x", 1L), ("A", "x", 1L),
      ("B", "y", 1L), ("B", "y", 2L), ("B", "y", 3L)
    ).toDF("q_a", "q_b", "sens")
    val r = Quality.lDiversityFrom(df, Seq(col("q_a"), col("q_b")),
      col("sens"), l = 2).collect().head
    assert(r.getAs[Long]("n_rows") == 7 && r.getAs[Long]("n_groups") == 2)
    assert(r.getAs[Long]("n_risky_groups") == 1)
    assert(r.getAs[Long]("n_risky_rows") == 4)
    assert(r.getAs[Long]("min_diversity") == 1 &&
      r.getAs[Long]("max_diversity") == 3)
    assert(r.getAs[Double]("risk_pct") == 0.5714)
  }

  test("t_closeness: skewed class flagged, balanced class not; TV hand-exact") {
    import spark.implicits._
    // global sensitive distribution: x:5, y:3 → p_g = (5/8, 3/8).
    // class A holds only x: TV = ½(|1−5/8| + |0−3/8|) = 0.375 — and
    // the absent-y mass reaches the score through the folded algebra;
    // class B (1x, 3y): TV = ½(|1/4−5/8| + |3/4−3/8|) = 0.375
    val df = Seq(
      ("A", "u", "x"), ("A", "u", "x"), ("A", "u", "x"), ("A", "u", "x"),
      ("B", "v", "x"), ("B", "v", "y"),
      ("B", "v", "y"), ("B", "v", "y")
    ).toDF("q_a", "q_b", "sens")
    val r = Quality.tClosenessFrom(df, Seq(col("q_a"), col("q_b")),
      col("sens"), t = 0.2).collect().head
    assert(r.getAs[Long]("n_rows") == 8 && r.getAs[Long]("n_groups") == 2)
    assert(r.getAs[Double]("min_tv4") == 0.375)
    assert(r.getAs[Double]("max_tv4") == 0.375)
    assert(r.getAs[Long]("n_risky_groups") == 2)
    assert(r.getAs[Double]("risk_pct") == 1.0)
    // a balanced class really scores 0: one class mirroring the global
    val bal = Seq(
      ("C", "w", "x"), ("C", "w", "y"),
      ("D", "w", "x"), ("D", "w", "y")
    ).toDF("q_a", "q_b", "sens")
    val rb = Quality.tClosenessFrom(bal, Seq(col("q_a"), col("q_b")),
      col("sens"), t = 0.2).collect().head
    assert(rb.getAs[Double]("max_tv4") == 0.0)
    assert(rb.getAs[Long]("n_risky_groups") == 0)
  }

  test("weighted_sample: equals the naive full-sort draw, partitioning-invariant") {
    import org.apache.spark.sql.expressions.Window
    val k = 16
    val docs = Tables.load(spark, sf, "documents")
    val wt = size(split(trim(col("text")), "\\s+")).cast("long")
    val got = Quality.weightedSampleFrom(docs, wt, k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == k)
    assert(got.map(_._1).toSeq == (1 to k))
    // bounded top-k aggregate must equal the naive global window sort
    val naive = docs.select(col("doc_id"), wt.as("wt"))
      .filter(col("wt") >= 1)
      .withColumn("es_key",
        log((Quality.knuth32(col("doc_id")) + 1).cast("double")
          / lit(4294967297.0)) / col("wt").cast("double"))
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("es_key").desc, col("doc_id"))))
      .filter(col("rk") <= k)
      .select(col("rk").cast("int"), col("doc_id"), col("wt"),
        round(col("es_key"), 8))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq == naive.toSeq)
    // same draw under a different physical partitioning
    val reshuffled = Quality.weightedSampleFrom(
      docs.repartition(7, col("lang")), wt, k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(reshuffled.toSeq == got.toSeq)
  }

  test("stratified_sample: exactly k per stratum, equals the window formulation") {
    import org.apache.spark.sql.expressions.Window
    val k = 10
    val got = Quality.stratifiedSample(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // every stratum contributes exactly k (fixture has >> k docs per lang)
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.length == k, s"stratum $s: ${rows.length}")
    }
    // the bounded aggregate must equal the naive per-stratum window
    val byH = Window.partitionBy("lang").orderBy("h", "doc_id")
    val naive = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("doc_id"),
        Quality.knuth32(col("doc_id")).as("h"))
      .withColumn("rk", row_number().over(byH))
      .filter(col("rk") <= k)
      .select(col("lang"), col("rk"), col("doc_id"), col("h"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(got.sortBy(r => (r._1, r._2)).toSeq ==
      naive.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("value_histogram: bins cover every row, bounds inside bins") {
    val rows = Quality.valueHistogram(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.load(spark, sf, "events").count())
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(r.getAs[Long]("min_c") >= bin * 2500
        && r.getAs[Long]("max_c") < (bin + 1) * 2500, r.toString)
    }
  }

  test("outlier_fences: flags exactly the values beyond the Tukey fences") {
    val rows = Quality.outlierFences(spark, sf).collect()
    assert(rows.length == 5) // one per event_type
    rows.foreach { r =>
      val (q1, q3) = (r.getLong(2), r.getLong(3))
      val iqr = q3 - q1
      assert(q3 >= q1)
      if (r.getLong(4) > 0) {
        // every reported outlier extreme actually breaches a fence
        val breach = (v: Long) => v * 2 < q1 * 2 - iqr * 3 || v * 2 > q3 * 2 + iqr * 3
        assert(breach(r.getLong(5)) && breach(r.getLong(6)))
      } else assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("profile_table: one row per column, exact counts, pruned per-column legs") {
    val rows = Quality.profileTable(spark, sf).collect()
    assert(rows.length == 6)
    val n = Tables.load(spark, sf, "orders").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("n_distinct") >= 1L)
    }
    val status = rows.find(_.getString(0) == "o_orderstatus").get
    assert(status.getAs[Long]("n_distinct") <= 3)
    // one leg per column, each scan PRUNED to its single column (total
    // I/O = the one-pass scan, without the 6x distinct-Expand blowup)
    val plan = planOf(Quality.profileTable(spark, sf))
      .split("== Initial Plan ==").head
    assert(plan.split("Scan parquet").length - 1 == 6, plan)
    assert(!plan.contains("Expand"), s"no distinct-expand:\n$plan")
    assert("ReadSchema: struct<o_orderkey:bigint>".r
      .findAllIn(plan).length == 1, plan)
  }

  test("profileApprox: HLL estimates within rsd bounds of the exact profile") {
    val exact = Quality.profile(Tables.load(spark, sf, "orders")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Quality.profileApprox(Tables.load(spark, sf, "orders"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, est) =>
      val e = exact(c).toDouble
      assert(math.abs(est - e) <= math.max(3, e * 0.15),
        s"$c: est $est vs exact $e")
    }
  }

  test("join_skew_report: hand-built skew yields exact distribution numbers") {
    import spark.implicits._
    import graft.operators.Quality
    // key 7 -> 6 rows, keys 1..3 -> 1 row each: n=9, keys=4, avg=2.25
    val df = (Seq.fill(6)(7L) ++ Seq(1L, 2L, 3L)).map(k => (k, "x"))
      .toDF("k", "v")
    val r = Quality.joinSkewReportFrom(df, "k").collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.25)            // avg
    assert(r.getDouble(3) == 1.0)             // p50 of (1,1,1,6)
    assert(r.getLong(5) == 6L)                // max
    assert(r.getDouble(6) == math.round(6 / 2.25 * 10000) / 10000.0)
    assert(r.getLong(7) == 7L && r.getDouble(8) == 0.6667)
  }

  test("join_skew_report: string keys report a real top_key, ties break low") {
    import spark.implicits._
    import graft.operators.Quality
    // "b" and "a" tie at 2 rows -> top_key must be "a" (smallest), not null
    val df = Seq("b", "b", "a", "a", "c").map(k => (k, 1)).toDF("k", "v")
    val r = Quality.joinSkewReportFrom(df, "k").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L)
    assert(r.getString(7) == "a" && r.getDouble(8) == 0.4)
  }

  test("k_anonymity: hand-built groups give exact risky counts") {
    import spark.implicits._
    // QI (g): a->2 rows, b->5 rows, c->1 row; k=3 => risky groups a,c
    val df = (Seq.fill(2)("a") ++ Seq.fill(5)("b") ++ Seq("c"))
      .zipWithIndex.toDF("g", "i")
    val r = Quality.kAnonymityFrom(df, Seq(col("g")), 3).collect().head
    assert(r.getAs[Int]("k") == 3)
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_risky_groups") == 2L)
    assert(r.getAs[Long]("n_risky_rows") == 3L)
    assert(r.getAs[Double]("risk_pct") == 0.375)
    assert(r.getAs[Long]("min_group") == 1L)
    assert(r.getAs[Long]("max_group") == 5L)
  }

  test("corpus_concentration: uniform lengths gini 0; known split exact") {
    import spark.implicits._
    // all-equal lengths => perfectly equal corpus, gini = 0
    val eq = Seq.fill(10)(100L).zipWithIndex.toDF("len", "i")
    val r0 = Quality.corpusConcentrationFrom(eq, col("len")).collect().head
    assert(r0.getAs[Long]("n_docs") == 10L)
    assert(r0.getAs[Long]("total_chars") == 1000L)
    assert(r0.getAs[Double]("gini6") == 0.0)
    // top-10% of 10 docs = 1 doc of 100 chars = 0.1 share
    assert(r0.getAs[Double]("top10_share") == 0.1)
    // 9 docs of 0 chars + 1 doc of 900: gini = (2*10*900)/(10*900) - 11/10
    val sk = (Seq.fill(9)(0L) :+ 900L).zipWithIndex.toDF("len", "i")
    val r1 = Quality.corpusConcentrationFrom(sk, col("len")).collect().head
    assert(r1.getAs[Double]("gini6") == 0.9)
    assert(r1.getAs[Double]("top1_share") == 1.0)   // k1 clamps to 1 doc
    assert(r1.getAs[Double]("top10_share") == 1.0)
  }

  test("totals_reconcile: exact/band/no-line/orphan buckets are exact") {
    import spark.implicits._
    // header 1: lines sum exactly; header 2: +5% off; header 3: no lines;
    // line key 99: orphan (no header)
    val o = Seq((1L, 100.00), (2L, 100.00), (3L, 50.00))
      .toDF("o_orderkey", "o_totalprice")
    val l = Seq(
      (1L, 100.00, 0.0, 0.0),     // = 10000 cents exactly
      (2L, 105.00, 0.0, 0.0),     // 10500 vs 10000 -> 500 bp
      (99L, 1.00, 0.0, 0.0))      // orphan
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val r = Quality.totalsReconcileFrom(o, l).collect().head
    assert(r.getAs[Long]("n_orders") == 3L)
    assert(r.getAs[Long]("n_no_lines") == 1L)
    assert(r.getAs[Long]("n_exact") == 1L)
    assert(r.getAs[Long]("n_within_1pct") == 1L)    // only the exact one
    assert(r.getAs[Long]("n_within_10pct") == 2L)   // exact + the 5% miss
    assert(r.getAs[Double]("p50_err_bp") == 250.0)  // median of {0, 500}
    assert(r.getAs[Long]("n_orphan_line_keys") == 1L)
  }
}
