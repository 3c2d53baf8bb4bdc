package graft

import graft.operators.{Dedup, ExportImport}
import org.apache.spark.sql.DataFrame

/** The verified-pairs artifact and its consuming audit family: one
  * materialized exact prefix join must reproduce every standalone audit
  * bit-for-bit — the production shape a 100 TB pipeline runs (ONE
  * corpus-scale join per corpus version, every audit a rollup over the
  * bounded pair table). */
class DedupPairsSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private lazy val pairsDir: String = {
    val dir = ExportImport.scratch("spec-verified-pairs")
    Dedup.verifiedPairsToDir(spark, sf, dir, tau = 0.3)
    dir
  }
  private lazy val pairs: DataFrame = Dedup.readVerifiedPairs(spark, pairsDir)
  private lazy val docs: DataFrame = Tables.load(spark, sf, "documents")

  test("artifact round-trips the exact join (schema + rows)") {
    val direct = Dedup.dedupNgramExactjoin(spark, sf, 0.3)
    // r20: the artifact additionally carries the UNROUNDED jaccard `j`
    // so above-floor consumers (split_leakage at 0.5) can filter the
    // exact value; the served query projects it away
    assert(pairs.columns.toSeq == Seq("id_a", "id_b", "j", "j4"))
    assert(rowsOf(pairs.select("id_a", "id_b", "j4")
      .orderBy("id_a", "id_b")) == rowsOf(direct))
    assert(pairs.count() > 0, "fixture must contain near-dup pairs")
    // j4 is exactly round(j, 4) row-for-row
    import org.apache.spark.sql.functions.{col, round => rnd}
    assert(pairs.filter(rnd(col("j"), 4) =!= col("j4")).count() == 0)
  }

  test("sourceOverlapFromPairs(artifact) == standalone source_overlap") {
    assert(rowsOf(Dedup.sourceOverlapFromPairs(pairs, docs))
      == rowsOf(Dedup.sourceOverlap(spark, sf)))
  }

  test("dedupClustersFromPairs(artifact) == standalone dedup_clusters") {
    assert(rowsOf(Dedup.dedupClustersFromPairs(docs.select("doc_id"), pairs))
      == rowsOf(Dedup.dedupClusters(spark, sf)))
  }

  test("dedupSurvivorshipFromPairs(artifact) == standalone survivorship") {
    assert(rowsOf(Dedup.dedupSurvivorshipFromPairs(pairs, docs))
      == rowsOf(Dedup.dedupSurvivorship(spark, sf)))
  }

  test("dedupClustersComposed (shared session artifact) == standalone") {
    // the headline #46b entry: same oracle as #46, pair join paid by
    // the session-shared artifact instead of per run
    assert(rowsOf(Dedup.dedupClustersComposed(spark, sf))
      == rowsOf(Dedup.dedupClusters(spark, sf)))
  }

  test("dedupSurvivorshipComposed (shared session artifact) == standalone") {
    // the headline #142b entry: same oracle as #142, pair join paid by
    // the session-shared artifact instead of per run
    assert(rowsOf(Dedup.dedupSurvivorshipComposed(spark, sf))
      == rowsOf(Dedup.dedupSurvivorship(spark, sf)))
  }

  test("dedupThresholdSweepFromPairs(artifact) == standalone sweep") {
    assert(rowsOf(Dedup.dedupThresholdSweepFromPairs(pairs))
      == rowsOf(Dedup.dedupThresholdSweep(spark, sf)))
  }

  test("dedupCorpusFromPairs(artifact) == standalone dedup_corpus") {
    // Jaccard is pairwise, so the full-corpus artifact restricted to
    // exact-canonical endpoints equals the join recomputed over the
    // survivors — the equality that makes the artifact reusable across
    // the whole audit family
    assert(rowsOf(Dedup.dedupCorpusFromPairs(docs, pairs))
      == rowsOf(Dedup.dedupCorpus(spark, sf)))
  }

  test("dedupCorpusComposed (shared session artifact) == standalone") {
    // the headline #70b entry: same oracle as #70, the corpus-scale
    // prefix join paid by the session-shared artifact instead of per
    // run — retires the sweep's heaviest standalone as the family
    // headline
    assert(rowsOf(Dedup.dedupCorpusComposed(spark, sf))
      == rowsOf(Dedup.dedupCorpus(spark, sf)))
  }

  test("incremental pairs append to exactly the combined-corpus artifact") {
    val full = Tables.load(spark, sf, "documents")
    val isDelta = org.apache.spark.sql.functions.col("doc_id") % 10 >= 8
    val base = full.filter(!isDelta)
    val delta = full.filter(isDelta)
    def shingled(df: DataFrame) = df.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.functions.TextShingles.shingles3(
        graft.functions.TextShingles.words(
          org.apache.spark.sql.functions.col("text"))).as("sh"))
    val basePairs = Dedup.dedupNgramExactjoinFrom(shingled(base))
    val increment = Dedup.incrementalPairsFrom(base, delta)
    assert(increment.count() > 0, "fixture delta must add pairs")
    // base artifact + increment == the artifact rebuilt on base ∪ delta
    val appended = (rowsOf(basePairs) ++ rowsOf(increment)).sorted
    val rebuilt = rowsOf(Dedup.dedupNgramExactjoinFrom(shingled(full))).sorted
    assert(appended == rebuilt,
      s"append must equal rebuild: ${appended.size} vs ${rebuilt.size} rows")
  }

  test("dedup_audit_composed summary matches the standalone audits") {
    val r = Dedup.dedupAuditComposed(spark, sf).collect().head
    assert(r.getAs[Long]("n_pairs") == pairs.count())
    assert(r.getAs[Long]("n_source_cells")
      == Dedup.sourceOverlap(spark, sf).count())
    val surv = Dedup.dedupSurvivorship(spark, sf).collect()
    assert(r.getAs[Long]("n_clusters_multi") == surv.length.toLong)
    assert(r.getAs[Long]("chars_dropped_total")
      == surv.map(_.getAs[Long]("chars_dropped")).sum)
    val corpus = Dedup.dedupCorpus(spark, sf).collect().head
    assert(r.getAs[Long]("n_in") == corpus.getAs[Long]("n_in"))
    assert(r.getAs[Long]("n_out") == corpus.getAs[Long]("n_out"))
    // the high-threshold pair count equals the 0.7 sweep row
    val hi = Dedup.dedupThresholdSweep(spark, sf).collect()
      .find(_.getAs[Double]("tau") == 0.7).get
    assert(r.getAs[Long]("n_pairs_hi") == hi.getAs[Long]("n_pairs"))
  }

  test("lsh_plan S-curve is sane; expected recall replays off the artifact") {
    val plan = Dedup.lshPlan(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
    assert(plan.map(p => p._1 * p._2).forall(_ == 64))
    plan.foreach { case (b, r, s50, ps) =>
      // probability grid is monotone in s and bounded
      assert(ps == ps.sorted && ps.forall(p => p >= 0.0 && p <= 1.0))
      // s50 really is the half-collision point of the closed form
      val pAtS50 = 1.0 - math.pow(1.0 - math.pow(s50, r), b)
      assert(math.abs(pAtS50 - 0.5) < 1e-4, s"(b=$b,r=$r): $pAtS50")
    }
    // more bands (same signature) always means higher recall at fixed s
    val p70 = plan.sortBy(_._1).map(_._4(2)).toSeq
    assert(p70 == p70.sorted, s"p_at_70 not monotone in bands: $p70")

    // expected recall off the artifact == direct mean of p(j4)
    val got = Dedup.lshExpectedRecall(pairs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val js = pairs.collect().map(_.getAs[Double]("j4"))
    got.foreach { case ((b, r), (n, rec)) =>
      assert(n == js.length)
      val direct = js.map(j => 1.0 - math.pow(1.0 - math.pow(j, r), b)).sum /
        js.length
      assert(math.abs(rec - direct) < 1e-3, s"(b=$b,r=$r): $rec vs $direct")
    }
    // the current dedup_minhash shape (32 bands x 2 rows) is a
    // high-recall scheme on this corpus's real pair distribution
    assert(got((32, 2))._2 > 0.9, s"32x2 recall: ${got((32, 2))}")
  }
}
