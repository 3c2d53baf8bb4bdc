package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Similarity, TextAnalysis}

/** Results must be a pure function of the DATA, never of the physical
  * layout: the same query over the same rows must produce identical
  * bytes at any partition count (the numeric doctrine — integer cents,
  * left folds, explicit tie-breaks — exists exactly for this). A 1000-
  * executor cluster repartitions constantly; any layout-sensitivity
  * here would surface as nondeterminism at scale. */
class InvarianceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("aggregations are partition-count invariant") {
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = (rows(Analytics.q1Agg(spark, sf)),
        rows(Analytics.aggSkewSalted(spark, sf)),
        rows(Analytics.topkFrequent(spark, sf)))
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = (rows(Analytics.q1Agg(spark, sf)),
        rows(Analytics.aggSkewSalted(spark, sf)),
        rows(Analytics.topkFrequent(spark, sf)))
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("dedup pipelines are partition-count invariant") {
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = (rows(Dedup.dedupMinhash(spark, sf)),
        rows(Dedup.dedupSimhash(spark, sf)))
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = (rows(Dedup.dedupMinhash(spark, sf)),
        rows(Dedup.dedupSimhash(spark, sf)))
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("seq_pack is invariant to the number of range partitions") {
    val a = rows(TextAnalysis.seqPack(spark, sf, maxTokens = 512, nRanges = 1))
    val b = rows(TextAnalysis.seqPack(spark, sf, maxTokens = 512, nRanges = 7))
    assert(a == b)
  }

  test("round-6 top-k, checksum, and entropy operators are partition-count invariant") {
    import graft.operators.{Curation, MergeImport}
    def all() = (
      rows(TextAnalysis.vocabCoverage(spark, sf)),
      rows(TextAnalysis.wordPmi(spark, sf)),
      rows(TextAnalysis.invertedIndex(spark, sf)),
      rows(TextAnalysis.sourceMixReport(spark, sf)),
      rows(Curation.shardAssign(spark, sf)),
      rows(Curation.bm25Search(spark, sf)),
      rows(Analytics.retentionCohorts(spark, sf)),
      rows(Analytics.eventDedup(spark, sf)),
      rows(MergeImport.scd2Intervals(spark, sf)),
      rows(Dedup.docContainment(spark, sf)))
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("round-7 operators are partition-count invariant") {
    import graft.operators.Curation
    def all() = (
      rows(TextAnalysis.bpeTrain(spark, sf)),
      rows(TextAnalysis.bpeEncode(spark, sf)),
      rows(TextAnalysis.qualityFunnel(spark, sf)),
      rows(Curation.dsirWeights(spark, sf)),
      rows(Dedup.dedupEvalSweep(spark, sf)),
      rows(Dedup.kgramNovelty(spark, sf)),
      rows(Dedup.sourceOverlap(spark, sf)),
      rows(Dedup.dedupThresholdSweep(spark, sf)),
      rows(Similarity.knnGraphAnn(spark, sf)),
      rows(Analytics.funnelWindowed(spark, sf)))
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("round-8 artifact operators are partition-count invariant") {
    def all() = (
      rows(Dedup.exactSubstrSpans(spark, sf)),
      rows(Dedup.dedupPairsIncremental(spark, sf)),
      rows(Dedup.dedupAuditComposed(spark, sf)),
      rows(Similarity.annIvfIndexed(spark, sf)))
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("dedup/eval/mixture additions are partition-count invariant") {
    import graft.operators.{Curation, Quality}
    def all() = (
      rows(Dedup.lineDedup(spark, sf)),
      rows(TextAnalysis.textNormalize(spark, sf)),
      rows(Dedup.dedupEval(spark, sf)),
      rows(Similarity.knnGraph(spark, sf)),
      rows(Quality.joinSkewReport(spark, sf)),
      rows(Similarity.annRecallEval(spark, sf)),
      rows(Similarity.quantizeEval(spark, sf)),
      rows(Curation.mixtureTemperature(spark, sf)))
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("round-10 operators are partition-count invariant") {
    import graft.operators.{Curation, ExportImport}
    // the composed split's artifact is BUILT per partition setting here
    // (distinct dirs) — the session-shared registry would otherwise
    // serve the partitions=1 build to the second pass and hide a
    // partition-dependent bug in the corpus prefix join
    def all() = {
      val dir = ExportImport.scratch(
        s"inv-pairs-p${spark.conf.get("spark.sql.shuffle.partitions")}")
      Dedup.verifiedPairsToDir(spark, sf, dir, 0.3)
      (rows(Dedup.exactSubstrScrub(spark, sf)),
        rows(Curation.leakageSafeSplitFrom(
          Tables.load(spark, sf, "documents").select(col("doc_id")),
          Dedup.readVerifiedPairs(spark, dir))))
    }
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("round-10b operators are partition-count invariant") {
    import graft.operators.{Blob, Similarity, TextAnalysis}
    def all() = (
      rows(TextAnalysis.charEntropy(spark, sf)),
      rows(TextAnalysis.zipfFit(spark, sf)),
      rows(TextAnalysis.langConfusion(spark, sf)),
      rows(Similarity.embeddingClassStats(spark, sf)),
      rows(Blob.mediaPngRoundtrip(spark, sf)))
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("round-10c operators are partition-count invariant") {
    import graft.operators.{Blob, ExportImport, Graph, Quality, Sessionize}
    def all() = (
      (rows(TextAnalysis.perplexityBuckets(spark, sf)),
        rows(TextAnalysis.lmPerplexityKn(spark, sf)),
        rows(TextAnalysis.tfidfEmbed(spark, sf)),
        rows(TextAnalysis.htmlStrip(spark, sf)),
        rows(Quality.weightedSample(spark, sf)),
        rows(Quality.lDiversity(spark, sf)),
        rows(Quality.benfordCheck(spark, sf))),
      (rows(Graph.pagerank(spark, sf)),
        rows(Similarity.embeddingPca(spark, sf)),
        rows(Similarity.ivfProbeSweep(spark, sf)),
        rows(Similarity.knnCommunities(spark, sf))),
      (rows(Analytics.eventsEwma(spark, sf)),
        rows(Analytics.eventsHopping(spark, sf)),
        rows(Analytics.joinSkewSalted(spark, sf)),
        rows(Sessionize.sessionizeNative(spark, sf)),
        rows(ExportImport.fixedWidthRoundtrip(spark, sf)),
        rows(Blob.mediaWavStats(spark, sf))))
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }

  test("round-12 sketch operators are partition-count invariant") {
    import graft.operators.{Quality, Sketches}
    // the sketch family is exactly where layout-sensitivity would
    // hide: KMV/HLL state merges, the CMS grid, cents-quantized
    // sufficient statistics, histogram rank extraction, and the
    // bottom-k pair sampler must all be pure functions of the data
    def all() = {
      // the jaccard operator caches its hash table — drop it between
      // settings so the p13 pass rebuilds under its own layout
      graft.operators.TransientCaches.release()
      spark.catalog.clearCache()
      (rows(Sketches.kmvDistinct(spark, sf)),
        rows(Sketches.hllDistinct(spark, sf)),
        rows(Sketches.cmsTopk(spark, sf)),
        rows(Sketches.hdrQuantiles(spark, sf)),
        rows(Sketches.sourceOverlapHll(spark, sf)),
        rows(Sketches.sourceJaccardKmv(spark, sf)),
        rows(Quality.corrMatrix(spark, sf)))
    }
    val one = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = all()
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val p13 = all()
      assert(p1 == p13)
    } finally spark.conf.set("spark.sql.shuffle.partitions", one)
  }
}
