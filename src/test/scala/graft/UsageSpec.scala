package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.Graft

/** The facade exercised on data that does NOT look like the test
  * fixtures — proving the library is reusable, not fixture-bound. */
class UsageSpec extends SparkSpec {

  import spark.implicits._

  test("facade: xlsx write/read on an arbitrary frame") {
    val dir = graft.operators.ExportImport.scratch("usage-xlsx")
    graft.sources.XlsxTables.clearDir(dir)
    val df = Seq((1L, "alpha", 1.5), (2L, "beta & <co>", -2.0))
      .toDF("id", "name", "score")
    Graft.writeXlsx(df, dir, table = "things", packageCode = "USAGE")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = Graft.readXlsx(spark, dir, schema).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "alpha", 1.5), (2L, "beta & <co>", -2.0)))
  }

  test("facade: unigram tokenizer, RRF fusion, and indexed MMR on " +
      "ad-hoc frames") {
    // unigram: train + encode on a corpus that looks nothing like the
    // fixtures; every word must segment (single-char coverage)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox again and again and again"),
      (3L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val lp = Graft.trainUnigram(docs, maxWords = 100)
    val enc = Graft.unigramEncode(docs, lp).collect()
    assert(enc.length == 3)
    enc.foreach { r =>
      assert(r.getLong(3) >= r.getLong(1), "≥ 1 token per word")
      assert(r.getLong(3) <= r.getLong(2), "≤ 1 token per char")
    }
    // RRF: both-list doc wins on ad-hoc ranked lists
    val lex = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1), (3L, 2)).toDF("doc_id", "rank")
    assert(Graft.rrfFuse(lex, vec).collect().head.getLong(0) == 2L)
    // query-keyed fuse: each query's single-list twin matches rrfFuse
    val vecQ = Seq((7L, 2L, 1), (7L, 3L, 2)).toDF("query_id", "doc_id",
      "rank")
    val byQ = Graft.rrfFuseByQuery(lex, vecQ).collect()
    assert(byQ.forall(_.getLong(0) == 7L)
      && byQ.head.getLong(1) == 2L)
    // BM25 artifact lifecycle on an ad-hoc corpus: build on a slice,
    // append the rest, serve — equals a one-shot build over everything
    val bmDir = graft.operators.ExportImport.scratch("usage-bm25")
    val bmFull = graft.operators.ExportImport.scratch("usage-bm25-full")
    Graft.buildBm25Stats(spark, docs.filter(col("doc_id") < 3), bmDir)
    Graft.appendBm25Stats(spark, bmDir, docs.filter(col("doc_id") >= 3))
    Graft.buildBm25Stats(spark, docs, bmFull)
    val servedIncr = Graft.bm25FromIndex(spark, bmDir, Seq("quick", "box"))
      .collect().map(_.toString).toSeq
    assert(servedIncr == Graft.bm25FromIndex(spark, bmFull,
      Seq("quick", "box")).collect().map(_.toString).toSeq)
    assert(servedIncr.nonEmpty)
    // indexed MMR over an ad-hoc embedding corpus (8-dim, not the
    // fixture's 64): build the artifact, MMR-select from it
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 40L)
      .map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val dir = graft.operators.ExportImport.scratch("usage-mmr-idx")
    graft.streaming.StreamIO.deleteRecursively(dir,
      spark.sparkContext.hadoopConfiguration)
    Graft.buildIvfIndexFrom(spark, corpus, dir, nCells = 4)
    val picks = Graft.mmrSelectFromIndex(spark, dir,
      corpus.filter(col("vec_id") < 2), nProbe = 4, k = 3).collect()
    assert(picks.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L))
    picks.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
    }
  }

  test("facade: upsert + snapshotDiff on a toy ledger") {
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val incoming = Seq((2L, 25L), (3L, 30L)).toDF("k", "v")
    val merged = Graft.upsert(base, incoming, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(merged == Set((1L, 10L), (2L, 25L), (3L, 30L)))
    val d = Graft.snapshotDiff(base, incoming, "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((1L, "removed"), (2L, "changed"), (3L, "added")))
  }

  test("facade: near-dup pairs + clusters on ad-hoc documents") {
    val mk = (s: String) =>
      graft.functions.TextShingles.shingles3(
        graft.functions.TextShingles.words(lit(s)))
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok20", "changed")
    val docs = Seq((1L, base), (2L, near), (3L, "totally different words here entirely"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.TextShingles.shingles3(
        graft.functions.TextShingles.words(col("text"))).as("sh"))
    val pairs = Graft.nearDupPairs(docs, tau = 0.5)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((1L, 2L)))
    val clusters = Graft.nearDupClusters(
      Seq(1L, 2L, 3L).toDF("doc_id"), pairs.select("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    // leakage-safe split: the near-dup group (1,2) always lands together
    val split = Graft.leakageSafeSplit(
      Seq(1L, 2L, 3L).toDF("doc_id"), pairs.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(split.keySet == Set(1L, 2L, 3L) && split(1L) == split(2L))
  }

  test("facade: quality checks on arbitrary frames") {
    val child = Seq((1L, "a"), (2L, "b"), (9L, "x")).toDF("fk", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphans = Graft.fkOrphans(child, "fk", parent, "pk").collect().head
    assert(orphans.getAs[Long]("n_orphan_lines") == 1L
      && orphans.getAs[Long]("min_key") == 9L)

    val sampled = spark.range(10000).toDF("id")
      .filter(Graft.sampleByKey("id", 20)).count()
    assert(sampled > 1500 && sampled < 2500, s"~20% expected, got $sampled")

    val hist = Graft.histogram(
      Seq(1L, 2L, 11L, 12L, 25L).toDF("v"), "v", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hist == Map(0L -> 2L, 1L -> 2L, 2L -> 1L))

    val prof = Graft.profile(Seq(("x", 1.0), ("y", 2.5)).toDF("s", "d"))
      .collect().map(r => r.getString(0) -> (r.getString(4), r.getString(5)))
      .toMap
    assert(prof("d") == ("100", "250")) // doubles surface as exact cents text
  }

  test("profile self-protects derived inputs: auto-persist, one materialization") {
    import graft.operators.Quality
    val joined = spark.range(100).toDF("id")
      .join(spark.range(100).selectExpr("id", "id * 2 AS v"), "id")
    val prof = Quality.profile(joined)
    val plan = planOf(prof)
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCache"),
      s"derived input must be profiled from a cache, not re-joined per leg:\n$plan")
    val rows = prof.collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Long]("n_rows") == 100L))
    joined.unpersist()
    // plain scans are NOT persisted — the column-pruned legs stay
    val scan = Tables.load(spark, sf, "orders")
    Quality.profile(scan)
    assert(scan.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("facade: asof join on an arbitrary ticker") {
    val quotes = Seq((1L, 10L, 100L), (1L, 20L, 110L)).toDF("qk", "qt", "px")
    val trades = Seq((1L, 15L), (1L, 25L), (1L, 5L)).toDF("k", "t")
    val joined = Graft.asofJoin(trades, quotes, "k", "qk", "t", "qt")
      .select("t", "px").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
      .toSet
    assert(joined == Set((15L, Some(100L)), (25L, Some(110L)), (5L, None)))
  }

  test("facade: curation on arbitrary frames") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "unrelated words only here now")).toDF("doc_id", "text")
    val bench = Seq((100L, "zzz alpha beta gamma delta qqq")).toDF("doc_id", "text")
    val hits = Graft.decontaminate(train, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(1L -> 1L)) // the one aligned 4-gram window

    val chunks = Graft.chunk(Seq((7L, "a" * 310)).toDF("doc_id", "text"),
      chunkSize = 200, stride = 150).collect()
    assert(chunks.map(_.getInt(2)).toSeq == Seq(200, 160, 10))

    val mix = Graft.mixtureSample(
      Seq((1L, "s", "w1 w2 w3"), (2L, "s", "w1 w2"), (3L, "t", "w1"))
        .toDF("doc_id", "source", "text"), budgetTokens = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // source s: hash order decides which doc fits the 3-token budget
    assert(mix.exists(_._1 == "t") && mix.forall(_._3 <= 3L))

    val tfidf = Graft.tfidfTopTerms(
      Seq((1L, "x x y"), (2L, "y z z")).toDF("doc_id", "text"), k = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(tfidf == Map(1L -> "x", 2L -> "z")) // rare repeated term wins
  }

  test("facade: round-4 curation/similarity entry points on arbitrary frames") {
    val base = Seq((1L, (1 to 30).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val delta = Seq(
      (10L, (1 to 30).map(i => s"b$i").mkString(" ")),
      (11L, "completely unrelated fresh words")).toDF("doc_id", "text")
    val inc = Graft.dedupIncremental(base, delta).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(inc == Map(10L -> "exact", 11L -> "kept"))

    val fuzzy = Graft.decontaminateFuzzy(
      Seq((1L, (1 to 30).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text"),
      Seq((5L, (1 to 30).map(i => if (i == 30) "x" else s"w$i").mkString(" ")))
        .toDF("doc_id", "text")).collect()
    assert(fuzzy.length == 1 && fuzzy.head.getLong(0) == 1L
      && fuzzy.head.getLong(1) == 5L)

    val up = Graft.upsampleMixture(
      Seq((1L, "a", "t t t"), (2L, "b", "u u")).toDF("doc_id", "source", "text"),
      Map("a" -> 2)).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(up == Set(("a", 2L, 6L), ("b", 1L, 2L)))

    val qz = Graft.quantizeEmbeddings(
      Seq((7L, Array(0.5f, -1.0f, 0.25f))).toDF("vec_id", "embedding"))
      .collect().head
    assert(qz.getDouble(1) == 127.0 && qz.getDouble(4) == 1.0)
  }

  test("facade: round-6 entry points on arbitrary frames") {
    // C4 cleaning on an ad-hoc two-line page
    val c4 = Graft.c4Clean(Seq(
      (1L, "good first line.\nbad line\nanother good line.")
    ).toDF("doc_id", "text"), minKeptLines = 2).collect().head
    assert(c4.getInt(1) == 3 && c4.getInt(2) == 2 && !c4.getBoolean(3))

    // PII scrub + repetition on the same ad-hoc docs
    val docs = Seq(
      (1L, "mail me at a@b.co or ping 10.0.0.1 thanks"),
      (2L, "spam spam spam spam spam")).toDF("doc_id", "text")
    val pii = Graft.piiScrub(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(pii(1L) == ((1L, 1L)) && pii(2L) == ((0L, 0L)))
    val rep = Graft.repetitionSignals(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(5))).toMap
    assert(rep(2L) && !rep(1L))

    // bloom decontamination agrees with exact decontamination
    val train = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val bench = Seq((100L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val hits = Graft.bloomDecontaminate(train, bench).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val exact = Graft.decontaminate(train, bench).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits.filter(_._2 > 0L) == exact)

    // funnel on a toy event log
    val fun = Graft.funnelSteps(
      Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "a", 5L))
        .toDF("user_id", "event_type", "t"), Seq("a", "b")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(fun == Map(1 -> 2L, 2 -> 1L))

    // checksum certificate equality source vs re-partitioned copy
    val src = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val a = Graft.integrityChecksum(src, concat_ws("|", col("k"), col("v")),
      lit("t")).collect().head
    val b = Graft.integrityChecksum(src.repartition(5),
      concat_ws("|", col("k"), col("v")), lit("t")).collect().head
    assert(a.getLong(2) == b.getLong(2))
  }

  test("facade: round-7 audit entry points work on ad-hoc frames") {
    import spark.implicits._

    // k-anonymity over one quasi-identifier column
    val ka = Graft.kAnonymity(
      Seq("a", "a", "a", "b").zipWithIndex.toDF("g", "i"),
      Seq(col("g")), k = 2).collect().head
    assert(ka.getAs[Long]("n_risky_groups") == 1L)

    // concentration of an all-equal corpus is gini 0
    val cc = Graft.corpusConcentration(
      Seq.fill(5)(10L).zipWithIndex.toDF("len", "i"), col("len"))
      .collect().head
    assert(cc.getAs[Double]("gini6") == 0.0)

    // attribution on a two-event frame
    val at = Graft.attributePurchases(
      Seq((1L, 1L, "view", 10L, 0L), (2L, 1L, "purchase", 20L, 100L))
        .toDF("event_id", "user_id", "event_type", "t", "v_c"),
      Seq("view"), windowUs = 100L).collect().head
    assert(at.getString(2) == "view")

    // path transitions
    val pt = Graft.pathTransitions(
      Seq((1L, "a", 1L, 1L), (1L, "b", 2L, 2L))
        .toDF("user_id", "event_type", "t", "event_id")).collect().head
    assert((pt.getString(0), pt.getString(1)) == (("a", "b")))

    // memorization grams on a planted repeat
    val span = "one two three four five"
    val mg = Graft.memorizationGrams(
      Seq((1L, span), (2L, span)).toDF("doc_id", "text"), minDocs = 2)
      .collect()
    assert(mg.length == 1 && mg.head.getLong(1) == 2L)

    // totals reconcile: exact match counts as exact
    val tr = Graft.totalsReconcile(
      Seq((1L, 10.0)).toDF("o_orderkey", "o_totalprice"),
      Seq((1L, 10.0, 0.0, 0.0))
        .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax"))
      .collect().head
    assert(tr.getAs[Long]("n_exact") == 1L)

    // zorder layout runs on an arbitrary integer pair frame
    val zl = Graft.zorderLayout(
      (for { x <- 0L until 8L; y <- 0L until 8L } yield (x, y))
        .toDF("xr", "yr"), bits = 3, nFiles = 4).collect()
    assert(zl.map(_.getString(0)).toSeq == Seq("linear", "zorder"))
  }

  test("facade: verified-pair artifact feeds the whole audit family") {
    import spark.implicits._
    val near = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, near, "web"), (2L, near + " iota", "web"),
      (3L, "one two three four five six seven", "books"),
      (4L, near, "books")) // exact near-dup of 1 across sources
      .toDF("doc_id", "text", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val sh = docs.select(col("doc_id"),
      graft.functions.TextShingles.shingles3(
        graft.functions.TextShingles.words(col("text"))).as("sh"))

    val dir = graft.operators.ExportImport.scratch("usage-pairs")
    Graft.writeVerifiedPairs(sh, dir, tau = 0.3)
    val pairs = Graft.readVerifiedPairs(spark, dir)
    // docs 1/2/4 pair up; doc 3 is unrelated
    assert(pairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L), (1L, 4L), (2L, 4L)))

    val cells = Graft.sourceOverlap(pairs, docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(cells == Set(("web", "web", 1L), ("books", "web", 2L)))

    val surv = Graft.dedupSurvivorship(pairs, docs).collect()
    assert(surv.length == 1 && surv.head.getAs[Long]("kept_doc") == 2L,
      "longest member (doc 2) must survive the single cluster")

    val sweep = Graft.dedupThresholdSweep(pairs, Seq(0.3, 0.9)).collect()
    assert(sweep.head.getAs[Long]("n_pairs") == 3L
      && sweep.last.getAs[Long]("n_pairs") == 1L) // only the 1-4 exact pair

    val audit = Graft.corpusDedupAudit(docs, pairs).collect().head
    // 4 in; doc 4 exact-removed (dup of 1); doc 2 near-removed; 2 out
    assert((audit.getAs[Long]("n_in"), audit.getAs[Long]("n_exact_removed"),
      audit.getAs[Long]("n_near_removed"), audit.getAs[Long]("n_out"))
      == ((4L, 1L, 1L, 2L)))

    // incremental maintenance on the same corpus: base = docs 1-3,
    // delta = doc 4 — the increment is exactly the pairs touching 4
    val incr = Graft.incrementalVerifiedPairs(
      docs.filter(col("doc_id") < 4).select("doc_id", "text"),
      docs.filter(col("doc_id") === 4).select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == Set((1L, 4L), (2L, 4L)))

    // missing artifacts fail with a clear message, not a Spark stack
    val err = intercept[IllegalArgumentException] {
      Graft.readVerifiedPairs(spark, "/nonexistent/pairs")
    }
    assert(err.getMessage.contains("verifiedPairsToDir"))
  }

  test("facade: IVF index build / serve / append on the fixture vectors") {
    val dir = graft.operators.ExportImport.scratch("usage-ivf")
    graft.sources.XlsxTables.clearDir(dir)
    Graft.buildIvfIndex(spark, sf, dir)
    val queries = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") < 3).select("vec_id", "embedding")
    val served = Graft.annServeFromIndex(spark, dir, queries, k = 3)
      .collect()
    assert(served.nonEmpty
      && served.forall(_.getAs[Long]("query_id") < 3L)
      && served.groupBy(_.getAs[Long]("query_id"))
        .values.forall(_.length <= 3))
    // append is accepted and extends the served candidate set
    Graft.appendIvfIndex(spark, dir,
      Tables.load(spark, sf, "embeddings")
        .filter(col("vec_id") >= 500)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
    val after = Graft.annServeFromIndex(spark, dir, queries, k = 3).collect()
    assert(after.length >= served.length)
    // the maintenance loop's facade: with no streamed deltas the drift
    // monitor sees current == baseline (PSI exactly 0, nothing flagged)
    // and the compactor has nothing to fold
    val drift = Graft.ivfDrift(spark, dir).collect()
    assert(drift.nonEmpty && drift.forall(!_.getAs[Boolean]("is_shifted")))
    assert(drift.forall(_.getAs[Double]("psi4") == 0.0))
    assert(Graft.compactIvfIndex(spark, dir).isEmpty)
    assert(Graft.compactArtifact(spark, dir + "-nonexistent").isEmpty)
  }

  test("facade: round-10 entry points on arbitrary frames") {
    // exactSubstrScrub: the repeated passage is cut, flanks survive
    val boiler = (1 to 9).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler unique ending one two three four five six seven"),
      (2L, s"prefix words here also eight nine ten eleven $boiler"),
      (3L, "entirely original text with no shared passages anywhere at all"))
      .toDF("doc_id", "text")
    val scrubbed = Graft.exactSubstrScrub(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scrubbed(1L) == 9L && scrubbed(2L) == 9L && scrubbed(3L) == 0L)

    // writeXlsxSingle: one Excel-openable file from an ad-hoc frame
    val path = graft.operators.ExportImport.scratch("usage-xlsx-single") +
      "/t.xlsx"
    Graft.writeXlsxSingle(Seq((1L, "x"), (2L, "y")).toDF("k", "v"),
      path, table = "t", packageCode = "PKG")
    val back = Graft.readXlsx(spark, path,
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, v STRING"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "x"), (2L, "y")))
  }

  test("facade: entropy gate, zipf fit, class stats on arbitrary frames") {
    // charEntropy as a composable Column + the gate over an ad-hoc frame
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaa"), // padding: ~0 bits
      (2L, "the quick brown fox jumps over the lazy dog near the river"),
      (3L, "9f8a7b6c5d4e3f2a1b0c9d8e7f6a5b4c3d2e1f0a9b8c7d6e5f4a3b2c1d0e"))
      .toDF("doc_id", "text")
    val gate = Graft.charEntropyGate(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(3))).toMap
    assert(gate(1L)._1 == 0.0 && gate(1L)._2, "padding must flag low")
    assert(gate(2L)._1 > 3.0 && gate(2L)._1 < 5.0 && !gate(2L)._2)
    val viaColumn = docs.select(Graft.charEntropy(col("text"))).collect()
      .map(_.getDouble(0))
    assert(viaColumn.contains(0.0))

    // zipfFit on a frame with a known skewed source
    val zdocs = Seq(
      ("s1", Seq.fill(32)("the").mkString(" ") + " " +
        Seq.tabulate(16)(i => Seq.fill(16 - i)(s"w$i").mkString(" "))
          .mkString(" ")))
      .toDF("source", "text")
    val z = Graft.zipfFit(zdocs).collect()
    assert(z.length == 1 && z(0).getDouble(2) < 0.0)

    // embeddingClassStats on a tiny labeled frame: two tight classes
    val embs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.96f, 0.28f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.28f, 0.96f), 1))
      .toDF("vec_id", "embedding", "label")
    val cs = Graft.embeddingClassStats(embs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(cs(0)._1 == 2 && cs(1)._1 == 2)
    assert(cs.values.forall(_._2 > 0.95), s"tight classes: $cs")
  }

  test("facade: round-10c entry points on arbitrary frames") {
    // perplexity family: a templated corpus scores its repeated bigrams low
    val docs = Seq((1L, "alpha beta gamma", "en"),
      (2L, "alpha beta gamma", "en"), (3L, "delta epsilon zeta", "en"),
      (4L, "eta theta iota", "xx"), (5L, "kappa lambda mu", "xx"),
      (6L, "nu xi omicron", "xx")).toDF("doc_id", "text", "lang")
    assert(Graft.perplexity(docs).count() == 6)
    assert(Graft.perplexityKn(docs).count() == 6)
    val buckets = Graft.perplexityBuckets(docs).collect()
      .map(_.getAs[String]("ppl_bucket")).toSet
    assert(buckets.subsetOf(Set("head", "middle", "tail")))

    // weighted sample: deterministic draw, k bounded by population
    val ws = Graft.weightedSample(docs, lit(10), k = 3).collect()
    assert(ws.length == 3 && ws.map(_.getAs[Long]("doc_id")).distinct.length == 3)

    // HTML strip on a frame with markup
    val html = Seq((1L, "<p>one two</p>")).toDF("doc_id", "text")
    val hs = Graft.htmlStrip(html).collect().head
    assert(hs.getAs[Long]("n_tags") == 2 && hs.getAs[Long]("n_words_clean") == 2)

    // hashed TF-IDF vectors: bucketed long format
    val emb = Graft.tfidfEmbed(docs, dim = 16).collect()
    assert(emb.nonEmpty && emb.forall(r =>
      r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 16))

    // pageRank on a toy chain; lDiversity/EWMA on toy frames
    val pr = Graft.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"))
      .collect().map(_.getDouble(1))
    assert(pr.forall(p => math.abs(p - 0.5) < 1e-9))
    val ld = Graft.lDiversity(
      Seq(("a", 1L, 9L), ("a", 2L, 9L)).toDF("q", "id", "sens"),
      Seq(col("q")), col("sens"), l = 2).collect().head
    assert(ld.getAs[Long]("n_risky_groups") == 1)
    val ew = Graft.eventsEwma(Seq((1L, 1L, 10L, 400L), (1L, 2L, 20L, 200L))
      .toDF("user_id", "event_id", "t", "v_c")).collect().head
    assert(ew.getAs[Double]("ewma6") == 3.0)

    // embedding PCA on a planted-direction frame
    val vecs = Seq((1L, Array(-1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(2f, 0f)), (4L, Array(-2f, 0f)))
      .toDF("vec_id", "embedding")
    val pca = Graft.embeddingPca(vecs).collect()
    assert(pca.map(_.getAs[Double]("loading6")).toSeq == Seq(1.0, 0.0))
  }

  test("facade: planned band recall + continuous sketch-state maintainer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the closed form behind hamming_plan, via the facade
    assert(Graft.plannedBandRecall(8, 7, 56, 7) >= 1.0 - 1e-9)
    assert(Graft.plannedBandRecall(8, 7, 56, 13) < 1.0)
    // the streaming maintainer keeps the artifact equal to a rebuild
    val root = graft.operators.ExportImport.scratch("usage-sketchstate")
    val (stateDir, ckpt) = (root + "/state", root + "/ckpt")
    Seq(stateDir, ckpt).foreach(d =>
      graft.streaming.StreamIO.deleteRecursively(d, spark.sparkContext.hadoopConfiguration))
    val rows = (1 to 12).map(i =>
      (if (i % 2 == 0) "a" else "b",
        (1 to 10).map(j => s"w${(i + j) % 7}").mkString(" ")))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = Graft.sketchStateMaintainer(
      input.toDF().toDF("source", "text"), stateDir, ckpt, k = 8)
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val got = graft.operators.Sketches.readSketchStates(spark, stateDir)
      .collect().map(_.toString).toSeq.sorted
    val want = graft.operators.Sketches
      .sketchStatesOf(rows.toDF("source", "text"), k = 8)
      .collect().map(_.toString).toSeq.sorted
    assert(got == want && got.nonEmpty)
  }

  test("facade: continuous IVF index maintainer lands served deltas") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = graft.operators.ExportImport.scratch("usage-ivfidx")
    val (dir, ckpt) = (root + "/idx", root + "/ckpt")
    Seq(dir, ckpt).foreach(d =>
      graft.streaming.StreamIO.deleteRecursively(d, spark.sparkContext.hadoopConfiguration))
    graft.operators.Similarity.ivfIndexToDir(spark, sf, dir)
    val nBase = graft.operators.Similarity.readIvfAssigned(spark, dir).count()
    val fresh = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(2).collect()
      .map(r => (r.getLong(0) + 5000L, r.getSeq[Float](1).toArray)).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = Graft.ivfIndexMaintainer(
      input.toDF().toDF("vec_id", "embedding"), dir, ckpt)
    try { input.addData(fresh: _*); q.processAllAvailable() } finally q.stop()
    val all = graft.operators.Similarity.readIvfAssigned(spark, dir)
    assert(all.count() == nBase + 2)
    assert(all.filter(col("vec_id") >= 5000L).count() == 2)
  }

  test("facade: continuous CUSUM monitor publishes the batch card") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = graft.operators.ExportImport.scratch("usage-cusum")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Long]
    // ~3 events/day over 10 days, as µs timestamps
    val us = (0 until 30).map(i => i.toLong * 86400000000L / 3)
    val q = Graft.cusumMonitor(
      input.toDF().select(timestamp_micros(col("value")).as("ts")), outDir)
    try { input.addData(us: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.read.parquet(outDir).collect().map(_.toString).sorted.toSeq
    val want = graft.operators.Analytics.eventsCusumFrom(
        us.toDF("us").select(expr("us div 86400000000").as("day")))
      .collect().map(_.toString).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("facade: IVF + PQ index lifecycle on ad-hoc 16-dim vectors with " +
      "offset ids") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = graft.operators.ExportImport.scratch("usage-ivfpq")
    graft.streaming.StreamIO.deleteRecursively(dir, conf)
    // 40 vectors, dim 16, ids from 1000 — nothing fixture-shaped: the
    // quantizer trains on the frame itself (ids offset far past any
    // `vec_id < k` window) and the PQ leg derives its sub-space count
    // from the actual dimension (16 → 2 sub-spaces, not the fixture 8)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map(i =>
        (1000L + i, Array.fill(16)((rnd.nextGaussian() / 4).toFloat)))
      .toDF("vec_id", "embedding")
    Graft.buildIvfIndexFrom(spark, vecs, dir, nCells = 4)
    assert(Graft.ivfQuantizerVersion(spark, dir).contains(1L))
    Graft.addPqIndex(spark, dir)
    val served = Graft.annServeFromPqIndex(spark, dir,
      vecs.filter(col("vec_id") < 1003), k = 3)
    assert(served.count() == 9, "3 queries × top-3 from the ADC leg")
    // the freshly trained leg reads its own fit: ratio exactly 1
    val drift = Graft.pqDrift(spark, dir).collect()
    assert(drift.length == 2 && drift.forall(r =>
      !r.getAs[Boolean]("is_stale") && r.getAs[Double]("ratio4") == 1.0),
      drift.mkString("; "))
    // a quiet maintenance epoch is a no-op and says so
    val r = Graft.maintainIvfIndex(spark, dir)
    assert(r.compactedThrough.isEmpty && !r.pqResynced
      && r.rebuiltToVersion.isEmpty && !r.pqRetrained, r.toString)
  }

  test("facade: gopher battery and MMR selection on ad-hoc frames") {
    import spark.implicits._
    // gopher: a long clean doc keeps, a short one fails the word floor
    val docs = Seq(
      (1L, "the and " + Seq.fill(58)("word").mkString(" ")),
      (2L, "the and short")).toDF("doc_id", "text")
    val g = Graft.gopherQuality(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(9)).toMap
    assert(g(1L) && !g(2L))
    // MMR: 4-dim toy — query q; a and a2 are near-duplicates both
    // closest to q, b is distinct. Plain top-2 is {a, a2}; MMR at
    // lambda 0.5 must swap the redundant a2 for the distinct b.
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // a
      (11L, Array(0.999f, 0.01f, 0.0f, 0.0f)), // a2 ~ a
      (12L, Array(0.6f, 0.0f, 0.8f, 0.0f))     // b distinct
    ).toDF("vec_id", "embedding")
    val queries = Seq((99L, Array(0.9f, 0.1f, 0.1f, 0.0f)))
      .toDF("vec_id", "embedding")
    val sel = Graft.mmrSelect(corpus, queries, k = 2, lambda = 0.5)
      .collect().map(r => (r.getInt(2), r.getLong(1))).toMap
    assert(sel(1) == 11L, s"rank 1 must be the most relevant (a2): $sel")
    assert(sel(2) == 12L,
      s"rank 2 must trade the near-dup for the distinct vector: $sel")
    // lambda = 1 keeps plain relevance order: {a2, a}
    val rel = Graft.mmrSelect(corpus, queries, k = 2, lambda = 1.0)
      .collect().map(r => (r.getInt(2), r.getLong(1))).toMap
    assert(rel(2) == 10L, s"lambda=1 must keep the near-dup pair: $rel")
  }

  test("facade: semantic decontamination on ad-hoc frames + the " +
      "pre-paid gate") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    // eval items, near-copies of two of them in the corpus, and clean
    // rows — 8-dim, ids offset (nothing fixture-shaped)
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(8)(rnd.nextGaussian().toFloat)
    val e1 = vec(); val e2 = vec()
    val nearE1 = e1.map(x => x + 0.01f)
    val nearE2 = e2.map(x => x + 0.01f)
    val eval = Seq((5000L, e1), (5001L, e2)).toDF("vec_id", "embedding")
    val corpus = (Seq((100L, nearE1), (101L, nearE2)) ++
        (0 until 20).map(i => (200L + i, vec())))
      .toDF("vec_id", "embedding")
    val rows = Graft.decontaminateSemantic(corpus, eval, nCells = 2,
        tau = 0.9).collect()
    val flagged = rows.filter(_.getBoolean(1))
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(flagged.keySet.intersect(Set(100L, 101L)) == Set(100L, 101L),
      s"near-copies of eval items must flag: $flagged")
    assert(flagged(100L) == 5000L && flagged(101L) == 5001L,
      s"the evidence row must name the matched eval item: $flagged")
    // the gate artifact answers the same question per arriving batch
    val root = graft.operators.ExportImport.scratch("usage-decon-gate")
    graft.streaming.StreamIO.deleteRecursively(root, conf)
    Graft.decontaminationGate(spark, corpus.unionByName(eval), eval,
      s"$root/gate", nCells = 2)
    graft.streaming.StreamDecontaminate.applyBatch(
      corpus.filter(col("vec_id") < 200), 0L, s"$root/gate",
      s"$root/out", 0.9)
    val streamed = spark.read.parquet(s"$root/out")
      .filter(col("contaminated")).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(streamed == Map(100L -> 5000L, 101L -> 5001L),
      s"gated batch must flag the same evidence: $streamed")
  }
}
