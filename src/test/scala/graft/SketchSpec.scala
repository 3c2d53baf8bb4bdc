package graft

import graft.functions.{SketchAggregates, SketchHash}
import graft.operators.{Quality, Sketches}
import org.apache.spark.sql.functions._

/** Sketch family: KMV / HLL cardinality, count-min heavy hitters, and
  * the correlation matrix. The aggregate tests replay sketch state
  * from scratch in Scala (BigInt arithmetic where overflow semantics
  * matter) so the custom TypedImperativeAggregates are checked against
  * an independent reference, not themselves. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val mixRef = BigInt("11400714819323198485")
  private val mod63 = BigInt(2).pow(63)

  test("sketch mix matches BigInt arithmetic incl. wrap edges") {
    val hs = Seq(0L, 1L, 97L, 256L, 12345678901234L,
      18014398509481983L /* KR modulus - 1 */)
    hs.foreach { h =>
      val want = ((BigInt(h) * mixRef) % mod63).toLong
      assert(SketchHash.mix(h) == want, s"mix($h)")
    }
    // and through the codegen'd expression path
    val got = hs.toDF("h").select(SketchHash.mix63(col("h")).as("g"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == hs.map(h => ((BigInt(h) * mixRef) % mod63).toLong))
  }

  test("minK aggregate equals sort-distinct-take-k across partitions") {
    val vals = (1 to 500).map(i => (i * 7919L) % 263L) // dupes guaranteed
    val got = vals.toDF("v").repartition(7)
      .agg(SketchAggregates.minK(col("v"), 10).as("mk"))
      .collect()(0).getSeq[Long](0)
    val want = vals.distinct.sorted.take(10)
    assert(got == want)
    // sub-saturation: fewer distincts than k returns them all, sorted
    val small = Seq(5L, 3L, 5L, 9L).toDF("v").repartition(3)
      .agg(SketchAggregates.minK(col("v"), 10).as("mk"))
      .collect()(0).getSeq[Long](0)
    assert(small == Seq(3L, 5L, 9L))
  }

  test("hll sketch state matches a from-scratch register replay") {
    val gs = (1 to 2000).map(i => SketchHash.mix(i * 1299721L))
    // independent register replay (same bit layout, BigInt-free: all
    // values are non-negative here by construction)
    val regs = new Array[Int](64)
    gs.foreach { g =>
      val reg = (g & 63L).toInt
      val w = (g >>> 6) & ((1L << 51) - 1)
      val rho = if (w == 0L) 52 else 52 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(reg)) regs(reg) = rho
    }
    val wantZero = regs.count(_ == 0)
    val wantS = regs.map(r => 1L << (52 - r)).sum
    val row = gs.toDF("g").repartition(5)
      .agg(SketchAggregates.hll(col("g")).as("h"))
      .select(col("h.n_regs_zero"), col("h.s_scaled")).collect()(0)
    assert(row.getInt(0) == wantZero)
    assert(row.getLong(1) == wantS)
  }

  test("kmv: sub-saturation is exact; saturated branch estimates") {
    val docs = Tables.load(spark, sf, "documents")
    val exact = Sketches.kmvDistinctFrom(docs, 1000000).collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      assert(r.getDouble(4) == r.getLong(1).toDouble, s"est != exact: $r")
      assert(r.getDouble(5) == 0.0)
    }
    val sat = Sketches.kmvDistinctFrom(docs, 64).collect()
    sat.foreach { r =>
      assert(r.getLong(2) == 64L) // k_used saturated
      assert(r.getLong(1) > 64L)
      // fixed corpus, deterministic hash: the KMV estimate lands well
      // inside 3-4 sigma of 1/sqrt(k-2) ~ 12.7%
      assert(math.abs(r.getDouble(5)) < 50.0, s"err too large: $r")
    }
  }

  test("hll: estimate within the m=64 error envelope on the corpus") {
    Sketches.hllDistinctFrom(Tables.load(spark, sf, "documents"))
      .collect().foreach { r =>
        assert(r.getLong(1) > 0)
        // sigma = 1.04/sqrt(64) = 13%; fixed corpus stays inside 3 sigma
        assert(math.abs(r.getDouble(5)) < 40.0, s"err too large: $r")
      }
  }

  test("cms: never undercounts; wide grid is collision-free, narrow is not") {
    val docs = Tables.load(spark, sf, "documents")
    val wide = Sketches.cmsTopkFrom(docs, 1 << 16, 20).collect()
    assert(wide.length == 20)
    wide.foreach(r => assert(r.getLong(3) == 0L, s"collision at w=65536: $r"))
    val narrow = Sketches.cmsTopkFrom(docs, 64, 20).collect()
    narrow.foreach(r => assert(r.getLong(3) >= 0L, s"undercount: $r"))
    assert(narrow.exists(_.getLong(3) > 0L),
      "w=64 must show collision overestimates")
  }

  test("corr matrix: exactly linear columns give corr of exactly ±1") {
    val df = (1 to 8).map(i =>
      (i.toDouble, 2.0 * i + 1.0, 7.0 - 3.0 * i)).toDF("a", "b", "c")
    val got = Quality.corrMatrixFrom(df, Seq("a", "b", "c")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == -1.0)
    assert(got(("b", "c")) == -1.0)
    assert(got.values.forall(v => !v.isNaN))
  }

  test("hll regs: elementwise-max union equals the single-pass sketch") {
    // the algebraic property sourceOverlapHll rides on: merging
    // per-group register arrays by elementwise max must give exactly
    // the registers of one sketch over the whole input
    val df = (1 to 3000).map(i => (i % 3, SketchHash.mix(i * 7919L)))
      .toDF("grp", "g").repartition(5)
    val merged = df.groupBy("grp")
      .agg(SketchAggregates.hllRegs(col("g")).as("regs"))
      .select(posexplode(col("regs"))).toDF("reg", "r")
      .groupBy("reg").agg(max("r").as("r"))
      .orderBy("reg").collect().map(_.getInt(1)).toSeq
    val whole = df.agg(SketchAggregates.hllRegs(col("g")).as("regs"))
      .collect()(0).getSeq[Int](0)
    assert(merged == whole)
  }

  test("hdr quantiles: estimates lower-bound exact within 1/16 relative") {
    val rows = Sketches.hdrQuantilesFrom(Tables.load(spark, sf, "documents"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("50", "90", "99").foreach { p =>
        val est = r.getAs[Long](s"p${p}_est")
        val ex = r.getAs[Long](s"p${p}_exact")
        assert(est <= ex, s"p$p over-estimates: $r")
        if (ex <= 31) assert(est == ex, s"p$p must be exact below 32: $r")
        else assert((ex - est).toDouble / ex < 1.0 / 16,
          s"p$p outside the 1/16 envelope: $r")
      }
      val err = r.getAs[Double]("maxerr_pct2")
      assert(err >= 0.0 && err <= 6.25, s"maxerr_pct2 out of bound: $r")
    }
  }

  test("hll union: overlap share consistent, estimate in envelope") {
    val row = Sketches.sourceOverlapHllFrom(
      Tables.load(spark, sf, "documents")).collect()(0)
    assert(row.getAs[Long]("n_sources") > 0)
    val sum = row.getAs[Double]("sum_src_est4")
    val union = row.getAs[Double]("union_est4")
    // union registers dominate every per-source register set, and the
    // sum of per-source estimates can only fall below the union by
    // estimator noise — never materially
    assert(union > 0 && sum >= union * 0.98, s"sum=$sum union=$union")
    assert(math.abs(row.getAs[Double]("err_pct2")) < 40.0, row.toString)
    val want = BigDecimal((sum - union) / sum * 100)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getAs[Double]("overlap_pct2") - want) <= 0.01,
      row.toString)
  }

  test("kmv jaccard: exact when the union fits in k; envelope on corpus") {
    // crafted fixture: shingle sets with known overlap, union << k
    // a: tokens 1..30, b: tokens 21..50 (10 of 40 shared 3-shingles
    // domain-wise), c: disjoint
    def doc(lo: Int, hi: Int) = (lo to hi).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      ("a", doc(1, 30)), ("b", doc(21, 50)), ("c", doc(100, 130)))
      .toDF("source", "text")
    val got = Sketches.sourceJaccardKmvFrom(docs, 256).collect()
      .map(r => ((r.getString(0), r.getString(1)), r)).toMap
    got.values.foreach { r =>
      assert(r.getAs[Double]("err6") == 0.0,
        s"sub-saturation must be exact: $r")
    }
    // a: shingles w1..w28-start (28), b: w21..w48-start (28); shared
    // start tokens 21..28 → 8 shared shingles; union 48
    assert(got(("a", "b")).getAs[Double]("jacc_exact6") ==
      math.round(8.0 / 48 * 1e6) / 1e6)
    assert(got(("a", "c")).getAs[Double]("jacc_exact6") == 0.0)
    // corpus envelope: k=256 → sigma ≈ sqrt(J(1-J)/256) ≤ 0.031; 5 sigma
    val corpus = Sketches.sourceJaccardKmvFrom(
      Tables.load(spark, sf, "documents"), 256).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val est = r.getAs[Double]("jacc_est6")
      assert(est >= 0.0 && est <= 1.0)
      assert(r.getAs[Long]("matches") <= r.getAs[Long]("k_union"))
      assert(r.getAs[Long]("k_union") <= 256L)
      assert(math.abs(r.getAs[Double]("err6")) < 0.16, r.toString)
    }
  }

  test("state artifact is sufficient: composed forms equal the standalones") {
    // the artifact doctrine's correctness half: everything the
    // composed queries publish must be derivable from the STORED
    // per-source states alone, value-for-value
    val jc = Sketches.sourceJaccardComposed(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val js = Sketches.sourceJaccardKmv(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(jc == js, "composed jaccard must equal the standalone's " +
      s"estimate columns; diff=${jc.toSet.diff(js.toSet).take(3)}")
    val qc = Sketches.hdrQuantilesComposed(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val qs = Sketches.hdrQuantiles(spark, sf)
      .select(col("source"), col("n"), col("n_buckets"),
        col("p50_est"), col("p90_est"), col("p99_est")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(qc == qs, "composed quantile card must equal the batch " +
      s"estimate leg; diff=${qc.toSet.diff(qs.toSet).take(3)}")
    assert(jc.nonEmpty && qc.nonEmpty)
  }

  test("plans: sketch aggregates partial-merge; no cartesian anywhere") {
    val docs = Tables.load(spark, sf, "documents")
    val kmvPlan = planOf(Sketches.kmvDistinctFrom(docs, 16))
    // TypedImperativeAggregate runs partial (per input partition) and
    // final (post-shuffle) — both must appear, or the sketch is being
    // built single-sided
    assert("min_k_distinct".r.findAllIn(kmvPlan).size >= 2, kmvPlan)
    val hllPlan = planOf(Sketches.hllDistinctFrom(docs))
    assert("hll_sketch".r.findAllIn(hllPlan).size >= 2, hllPlan)
    Seq(Sketches.kmvDistinctFrom(docs, 16),
      Sketches.hllDistinctFrom(docs),
      Sketches.cmsTopkFrom(docs, 512, 20),
      Sketches.hdrQuantilesFrom(docs),
      Quality.corrMatrixFrom(Tables.load(spark, sf, "lineitem"),
        Seq("l_quantity", "l_tax"))).foreach(assertNoCartesian)
    // sourceOverlapHll joins three 1-row frames keylessly by design —
    // excluded from the cartesian check; what matters is that its regs
    // aggregate partial-merges too
    val ovPlan = planOf(Sketches.sourceOverlapHllFrom(docs))
    assert("hll_sketch".r.findAllIn(ovPlan).size >= 2, ovPlan)
    // kmv jaccard tags sketch rows against the bounded source list by
    // broadcast nested-loop (by design); its corpus-side aggregate must
    // still partial-merge
    val sjPlan = planOf(Sketches.sourceJaccardKmvFrom(docs, 64))
    assert("min_k_distinct".r.findAllIn(sjPlan).size >= 2, sjPlan)
  }
}
