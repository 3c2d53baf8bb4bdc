package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}
import graft.functions.TextShingles

class CurationSpec extends SparkSpec {

  test("pipeline_report: stages chain exactly, planted rejections land") {
    val rows = graft.operators.Curation.pipelineReport(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._2).toSeq ==
      Seq("charset", "entropy", "quality", "duplicate", "contaminated"))
    // n_out of each stage is n_in of the next; volumes conserve
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 == b._3, s"$a -> $b")
    }
    rows.foreach { case r @ (_, _, in, rej, out) =>
      assert(in == rej + out, r)
    }
    assert(rows.head._3 == Tables.load(spark, sf, "documents").count())
    // the bench slice guarantees contaminated rejections (eval docs
    // that survived the earlier gates evict themselves here)
    assert(rows.last._4 > 0, rows.mkString(";"))
  }

  test("decontaminate: exactly the docs sharing a 4-gram with the bench slice; bench side broadcast") {
    // brute-force reference on the tiny SF
    val grams = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        explode(graft.functions.WordShinglesExpr.wordShingles(
          TextShingles.words(col("text")), 4)).as("gram"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bench = grams.filter(_._1 % 50 == 0).map(_._2).toSet
    val expect = grams.filter { case (id, g) => id % 50 != 0 && bench(g) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length).toMap
    val got = Curation.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect.map { case (k, v) => (k, v.toLong) })
    assert(got.keySet.forall(_ % 50 != 0), "benchmark docs are never flagged")
    val plan = planOf(Curation.decontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"the benchmark gram set must broadcast:\n$plan")
  }

  test("bloom_decontaminate: hit grams equal the exact check; candidates bound FPs") {
    val exact = Curation.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val bloom = Curation.bloomDecontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the bitmap never loses a true hit: per-doc hit counts match #71
    val bloomHits = bloom.filter(_._3 > 0).map(r => (r._1, r._3)).toMap
    assert(bloomHits == exact)
    // candidates ⊇ hits, and the FP tail is small at this m/n ratio
    bloom.foreach { case (id, cand, hit) =>
      assert(cand >= hit, s"doc $id: cand $cand < hit $hit")
    }
    val fps = bloom.map(r => r._2 - r._3).sum
    val cands = bloom.map(_._2).sum
    assert(fps.toDouble / math.max(cands, 1) < 0.5,
      s"false-positive share $fps/$cands out of spec for m=65536")
  }

  test("doc_chunk: chunks reassemble the document exactly (stride prefixes + final tail)") {
    val text = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val chunks = Curation.docChunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // per doc: every chunk but the last is full-size-or-tail consistent;
    // start offsets tile the text with stride 150, so lengths determine
    // exact reconstruction: len_i = min(200, L - 150*i)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val l = text(id).length
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, "dense chunk_ix")
      sorted.foreach { case (_, ix, cLen, _) =>
        assert(cLen == math.min(200, l - 150 * ix),
          s"doc $id chunk $ix length $cLen (L=$l)")
      }
      assert(sorted.length == (l - 1) / 150 + 1)
    }
    // empty / sub-stride texts: zero chunks for "", one chunk otherwise
    import spark.implicits._
    val edge = Curation.chunkFrom(
      Seq((1L, ""), (2L, "ab"), (3L, "x" * 150), (4L, "y" * 151))
        .toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(edge.toSeq == Seq((2L, 0, 2), (3L, 0, 150), (4L, 0, 151), (4L, 1, 1)))
    // map-only: the only shuffle is the presentation sort's range
    // partitioning — no hash exchange (join/agg) anywhere
    val plan = planOf(Curation.docChunk(spark, sf))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunking must not hash-shuffle:\n$plan")
  }

  test("mixture_sample: per-source budget respected and maximal in hash order") {
    val rows = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val got = Curation.mixtureSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val bySource = rows.groupBy(_._2)
    got.foreach { case (src, nDocs, nTok) =>
      val ordered = bySource(src)
        .sortBy { case (id, _, _) => ((id * 2654435761L) % 4294967296L, id) }
      // greedy prefix under the budget
      val cum = ordered.map(_._3).scanLeft(0L)(_ + _).tail
      val keep = cum.takeWhile(_ <= 1000L).length
      assert(nDocs == keep.toLong, s"$src kept $nDocs != expected $keep")
      assert(nTok == ordered.take(keep).map(_._3).sum && nTok <= 1000L)
    }
    assert(got.map(_._1).toSet == bySource.keySet, "every source reports")
  }

  test("tfidf_topterms: df counts docs containing the term; top-3 per doc by score") {
    val out = Curation.tfidfTopterms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val words = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), TextShingles.words(col("text")).as("w"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val docCount = words.length
    val dfRef = words.flatMap { case (_, w) => w.distinct }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    out.foreach { case (id, term, tf, df, score) =>
      assert(df == dfRef(term), s"df($term)")
      val ws = words.toMap.apply(id)
      assert(tf == ws.count(_ == term).toLong, s"tf($id,$term)")
      val expect = BigDecimal(tf * math.log((docCount + 1).toDouble / (df + 1)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(score - expect) < 1e-9, s"score($id,$term)")
    }
    assert(out.groupBy(_._1).forall(_._2.length <= 3))
    // rank-3 cutoff really is the 3 best: no unpicked term beats a picked one
    val picked = out.groupBy(_._1).view.mapValues(_.map(_._5).min).toMap
    words.foreach { case (id, w) =>
      val counts = w.groupBy(identity).view.mapValues(_.length).toMap
      val best = counts.map { case (t, n) =>
        BigDecimal(n * math.log((docCount + 1).toDouble / (dfRef(t) + 1)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq.sorted.reverse
      val kth = best.take(3).last
      assert(picked(id) >= kth - 1e-9, s"doc $id picked ${picked(id)} < $kth")
    }
  }

  test("decontaminate_fuzzy: equals brute-force cross-corpus Jaccard argmax; no cartesian") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        TextShingles.shingles3(TextShingles.words(col("text"))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val (bench, train) = docs.partition(_._1 % 50 == 0)
    val expect = train.flatMap { case (tid, ts) =>
      val hits = bench.flatMap { case (bid, bs) =>
        val inter = (ts & bs).size
        val denom = ts.size + bs.size - inter
        val j = if (denom == 0) 0.0 else inter.toDouble / denom
        if (j >= 0.5) Some((bid, j)) else None
      }
      if (hits.isEmpty) None
      else {
        val best = hits.maxBy { case (bid, j) =>
          (BigDecimal(j).setScale(4, BigDecimal.RoundingMode.HALF_UP), bid) }
        Some((tid, best._1))
      }
    }.toMap
    val got = Curation.decontaminateFuzzy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect)
    assertNoCartesian(Curation.decontaminateFuzzy(spark, sf))
  }

  test("mixture_upsample: per-source epoch multiplication is exact; positions deterministic") {
    val src = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val weights = Map("src0" -> 3L, "src1" -> 3L, "src2" -> 2L, "src3" -> 2L)
    val got = Curation.upsampleMixture(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    src.groupBy(_._2).foreach { case (source, docs) =>
      val e = weights.getOrElse(source, 1L)
      val (nDocs, nEmit, toks) = got(source)
      assert(nDocs == docs.length.toLong)
      assert(nEmit == docs.length * e, s"$source emitted")
      assert(toks == docs.map(_._3).sum * e, s"$source tokens")
    }
    // deterministic: two runs agree exactly (positions included)
    val again = Curation.upsampleMixture(spark, sf).collect().toSeq.map(_.toString)
    assert(again == Curation.upsampleMixture(spark, sf).collect().toSeq.map(_.toString))
  }

  test("c4_clean: each C4 rule decides exactly as specified") {
    import spark.implicits._
    val docs = Seq(
      // all lines clean and terminal-punctuated -> kept page
      (1L, "one two three.\nfour five six!\nseven eight nine?"),
      // unterminated + short lines dropped; page dies on < 3 kept
      (2L, "one two three\nfour five six.\nno."),
      // javascript line dropped, others survive
      (3L, "good line here.\nthis javascript menu.\nmore text here.\nlast good line."),
      // lorem ipsum kills the page even with clean lines
      (4L, "one two three.\nfour five six.\nlorem ipsum dolor.\nseven eight nine."),
      // curly brace kills the page
      (5L, "one two three.\nfunction() {\nfour five six.\nseven eight nine.")
    ).toDF("doc_id", "text")
    val got = Curation.c4CleanFrom(docs).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getBoolean(3))))
      .toMap
    assert(got(1L) == ((3, 3, false)))
    assert(got(2L) == ((3, 1, true))) // only "four five six." survives
    assert(got(3L) == ((4, 3, false)))
    assert(got(4L) == ((4, 4, true))) // lorem ipsum: page-level kill
    assert(got(5L) == ((4, 3, true))) // brace: page-level kill
    // the cleaned fingerprint is of the KEPT lines only
    val sha3 = Curation.c4CleanFrom(docs).filter(col("doc_id") === 3)
      .collect().head.getString(4)
    val manual = java.security.MessageDigest.getInstance("SHA-256")
      .digest("good line here.\nmore text here.\nlast good line."
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sha3 == manual)
  }

  /** Each of docs 2..8 fails EXACTLY ONE Gopher rule (doc 1 passes
    * all) — shared by the battery and attribution-report specs. */
  private def gopherCraftedDocs = {
    import spark.implicits._
    val ok = ("the and " + Seq.fill(58)("word").mkString(" ")) // 60 words
    Seq(
      (1L, ok),                                         // all rules pass
      (2L, "the and tiny doc under fifty words"),       // word-count fail
      (3L, (Seq.fill(50)("abcdefghijkl") ++ Seq("the", "and", "of"))
        .mkString(" ")),                                // mean-wlen > 10
      (4L, ok + " ## ## ## ## ##"),                     // symbol ratio fail
      (5L, (0 until 10).map(i => "- " + ok).mkString("\n")), // all bullets
      (6L, Seq(ok + "...", ok + "...", ok, ok).mkString("\n")), // ellipsis
      (7L, ("the and " + (Seq.fill(30)("abcd") ++ Seq.fill(20)("123"))
        .mkString(" "))),                               // alpha ratio fail
      (8L, Seq.fill(60)("zebra").mkString(" "))         // stop-word fail
    ).toDF("doc_id", "text")
  }

  test("gopher_quality: each published rule fails exactly its crafted doc") {
    val docs = gopherCraftedDocs
    val got = Curation.gopherQualityFrom(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(9), "doc 1 must keep")
    (2L to 8L).foreach(id =>
      assert(!got(id).getBoolean(9), s"doc $id must be dropped"))
    // the failing metric is the one the doc was crafted to break
    assert(got(2L).getInt(1) < 50)                      // n_words
    assert(got(3L).getDouble(3) > 10.0)                 // mean_wlen4
    assert(got(4L).getDouble(4) > 0.1)                  // sym_ratio4
    assert(got(5L).getDouble(5) > 0.9)                  // bullet_ratio4
    assert(got(6L).getDouble(6) > 0.3)                  // ellipsis_ratio4
    assert(got(7L).getDouble(7) < 0.8)                  // alpha_ratio4
    assert(got(8L).getInt(8) < 2)                       // n_stop
    // and each failing doc passes every OTHER rule (isolated failures)
    assert(got(4L).getInt(1) >= 50 && got(4L).getDouble(7) >= 0.8)
    assert(got(7L).getInt(1) >= 50 && got(7L).getInt(8) >= 2)
    // fixture form: both outcomes occur and the synthesis is stable
    val fx = Curation.gopherQuality(spark, sf).collect()
    assert(fx.map(_.getBoolean(9)).distinct.length == 2,
      "sf fixture must produce both keep outcomes")
    val again = Curation.gopherQuality(spark, sf).collect()
    assert(fx.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("gopher_quality: case, blank-line, and per-symbol robustness " +
      "(Rae et al. rules on a corpus the fixture can't produce)") {
    import spark.implicits._
    val ok = ("the and " + Seq.fill(58)("word").mkString(" "))
    val docs = Seq(
      // ALL-CAPS doc: words contain alphabetics, 'The'/'And' are stop
      // hits — must keep (pre-fix: alpha_ratio 0 and n_stop 0)
      (1L, "The And " + Seq.fill(58)("WORD").mkString(" ")),
      // blank lines between paragraphs add no words and no penalty
      (2L, ok.split(" ").grouped(20).map(_.mkString(" "))
        .mkString("\n\n")),
      // 4 hash chars AND 4 ellipses over 60 words: each per-symbol
      // ratio 0.067 ≤ 0.1 → keep (the summed pre-fix ratio 0.133
      // would have dropped it)
      (3L, ("the and word# word# word# word# wo...rd wo...rd wo...rd " +
        "wo...rd " + Seq.fill(52)("word").mkString(" "))),
      // '* ' bullets and '…' line-ends count toward their rules
      (4L, (0 until 10).map(_ => "* " + ok).mkString("\n")),
      (5L, Seq(ok + "…", ok + "…", ok, ok).mkString("\n")),
      // whitespace-only page: n_words = 0 — ratios are DEFINED 0.0 and
      // keep is a real false, never a divide-by-zero NULL (ADVICE-r19)
      (6L, "  \n \n  ")
    ).toDF("doc_id", "text")
    val got = Curation.gopherQualityFrom(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(9), "all-caps doc must keep")
    assert(got(1L).getDouble(7) == 1.0 && got(1L).getInt(8) >= 2)
    assert(got(2L).getBoolean(9), "blank-line doc must keep")
    assert(got(2L).getInt(1) == 60, "blank lines add no words")
    assert(got(3L).getBoolean(9), "per-symbol ratios each under 0.1")
    assert(got(3L).getDouble(4) <= 0.1)
    assert(!got(4L).getBoolean(9) && got(4L).getDouble(5) > 0.9,
      "star bullets count")
    assert(!got(5L).getBoolean(9) && got(5L).getDouble(6) > 0.3,
      "unicode ellipsis line-ends count")
    assert(!got(6L).isNullAt(9) && !got(6L).getBoolean(9),
      "whitespace-only doc must be a real false, not NULL")
    assert(got(6L).getInt(1) == 0 && got(6L).getDouble(3) == 0.0
      && got(6L).getDouble(4) == 0.0 && got(6L).getDouble(7) == 0.0,
      "empty-doc ratios are defined as 0.0")
    // threshold threading: a loosened report must re-rank the knobs
    val strict = Curation.gopherReportFrom(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val loose = Curation.gopherReportFrom(docs, maxBulletRatio = 1.0,
      maxEllipsisRatio = 1.0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strict("bullet_lines") == 1L && strict("ellipsis_lines") == 1L)
    assert(loose("bullet_lines") == 0L && loose("ellipsis_lines") == 0L)
  }

  test("gopher_report: each rule attributes exactly its one crafted " +
      "exclusive failure; report flags cannot disagree with keep") {
    val rep = Curation.gopherReportFrom(gopherCraftedDocs).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    Seq("word_count", "mean_word_len", "symbol_ratio", "bullet_lines",
      "ellipsis_lines", "alpha_words", "stop_words").foreach { rule =>
      assert(rep(rule) == ((1L, 1L, 0.125)), s"$rule -> ${rep(rule)}")
    }
    // consistency with the battery on the fixture: total exclusive
    // failures can never exceed total dropped docs, and a corpus-level
    // rule with zero fails contributes zero exclusives
    val fx = Curation.gopherReport(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dropped = Curation.gopherQuality(spark, sf).collect()
      .count(!_.getBoolean(9))
    assert(fx.map(_._3).sum <= dropped.toLong)
    fx.foreach { case (rule, nf, ne) =>
      assert(ne <= nf, s"$rule exclusive $ne > fail $nf") }
  }

  test("retrieval_fuse: RRF ranks both-list docs above single-list " +
      "peers, self-fusion is order-preserving, missing legs score 0") {
    import spark.implicits._
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val vec = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "rank")
    val fused = Curation.rrfFuseFrom(lex, vec).collect()
    val order = fused.map(_.getLong(0)).toSeq
    // 20: 1/62 + 1/61 tops 10: 1/61 + 1/63; 30/40 are single-list
    assert(order == Seq(20L, 10L, 40L, 30L), order.toString)
    // a single-list doc carries a null rank on the absent leg and its
    // rrf is exactly the one reciprocal
    val r30 = fused.find(_.getLong(0) == 30L).get
    assert(r30.isNullAt(2) && math.abs(r30.getDouble(3) - 1.0 / 63) < 1e-6)
    // self-fusion preserves the list's own order (monotone reciprocal)
    val self = Curation.rrfFuseFrom(lex, lex).collect().map(_.getLong(0))
    assert(self.toSeq == Seq(10L, 20L, 30L))
    // query-keyed fuse: a query whose vector leg came back EMPTY still
    // gets its lex-only fused list when the batch's query set rides
    // along (the StreamFuse contract) — per-query rows match the
    // single-query rrfFuseFrom twins
    val vecQ = Seq((7L, 20L, 1), (7L, 40L, 2), (7L, 10L, 3))
      .toDF("query_id", "doc_id", "rank")
    val ids = Seq(7L, 8L).toDF("query_id")
    val byQ = Curation.rrfFuseByQuery(lex, vecQ, queryIds = Some(ids))
      .collect()
    val q7 = byQ.filter(_.getLong(0) == 7L).map(r => r.toSeq.drop(1).toList)
    val q8 = byQ.filter(_.getLong(0) == 8L).map(r => r.toSeq.drop(1).toList)
    assert(q7.toSeq == Curation.rrfFuseFrom(lex, vec).collect()
      .map(_.toSeq.toList).toSeq, "vec-backed query equals rrfFuseFrom")
    assert(q8.toSeq == Curation.rrfFuseFrom(lex,
        vec.filter(lit(false))).collect().map(_.toSeq.toList).toSeq
      && q8.nonEmpty, "vec-less query gets the lex-only fusion")
    // fixture form: ≤ k rows, deterministic, and the fused set is a
    // subset of the two legs' union
    val fx = Curation.retrievalFuse(spark, sf).collect()
    assert(fx.length <= 10 && fx.nonEmpty)
    val again = Curation.retrievalFuse(spark, sf).collect()
    assert(fx.map(_.toString).toSeq == again.map(_.toString).toSeq)
    val lexIds = Curation.bm25Search(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val vecIds = graft.operators.Similarity
      .annBruteforce(spark, sf, nQueries = 1, k = 20)
      .collect().map(_.getLong(1)).toSet
    fx.foreach(r => assert(lexIds.contains(r.getLong(0))
      || vecIds.contains(r.getLong(0))))
    // serving form: at full probes the artifact vector leg equals the
    // brute one, so the fused table is identical (the ann_mmr_indexed
    // equality stance applied to fusion); production probes still
    // return a fused top-k
    val servedFull = Curation.retrievalFuseIndexed(spark, sf, nProbe = 16)
      .collect().map(_.toString).toSeq
    assert(servedFull == fx.map(_.toString).toSeq,
      "full-probe served fusion must equal the brute fusion")
    assert(Curation.retrievalFuseIndexed(spark, sf).collect().length <= 10)
  }

  test("shard_assign: balanced Knuth shards, exact heads in (hash, id) order, no window") {
    def knuth(id: Long): Long = {
      val a = ((id % 4294967296L) + 4294967296L) % 4294967296L
      val a1 = a / 65536L; val a0 = a % 65536L
      (a0 * 2654435761L % 4294967296L +
        a1 * 2654435761L % 65536L * 65536L) % 4294967296L
    }
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong))
    val byShard = docs.groupBy { case (id, _) => (knuth(id) % 8).toInt }
    val got = Curation.shardAssign(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4)))
    got.groupBy(_._1).foreach { case (shard, rows) =>
      val members = byShard(shard)
      assert(rows.head._2 == members.length.toLong, s"shard $shard n_docs")
      assert(rows.head._3 == members.map(_._2).sum, s"shard $shard tokens")
      val expectHead = members.map(_._1)
        .sortBy(id => (knuth(id), id)).take(8)
      assert(rows.sortBy(_._4).map(_._5).toSeq == expectHead.toSeq,
        s"shard $shard head order")
    }
    assert(got.map(_._1).distinct.sorted.toSeq == byShard.keySet.toSeq.sorted)
    // bounded top-k aggregate, never a per-shard sort/window
    val plan = planOf(Curation.shardAssign(spark, sf))
    assert(!plan.contains("Window"), s"no window in shard_assign:\n$plan")
  }

  test("bm25_search: scores match a hand-rolled reference, top-k ordered") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+")))
    val terms = Seq("data", "filter", "join")
    val n = docs.length.toLong
    val sumDl = docs.map(_._2.length.toLong).sum
    val dfs = terms.map(t => docs.count(_._2.contains(t)).toLong)
    val expect = docs.map { case (id, w) =>
      val dl = w.length.toLong
      val score = terms.zipWithIndex.map { case (t, i) =>
        val tf = w.count(_ == t).toLong
        val idf = math.log(1.0 + (n - dfs(i) + 0.5) / (dfs(i) + 0.5))
        idf * ((tf.toDouble * (1.2 + 1.0)) /
          (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / (sumDl.toDouble / n)))))
      }.reduce(_ + _)
      (id, BigDecimal(score)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Curation.bm25Search(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(5)))
    assert(got.toSeq == expect.toSeq)
    val plan = planOf(Curation.bm25Search(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a heap merge:\n$plan")
  }

  test("bm25_indexed: artifact-served list equals the brute search, " +
      "postings probe is pruned, missing marker refuses") {
    // the fixture's top-20 all contain >= 1 query term, so the
    // postings representation returns the identical frame (scores
    // bit-identical: absent terms add exactly +0.0 in both forms)
    val brute = Curation.bm25Search(spark, sf).collect().map(_.toString)
    val served = Curation.bm25Indexed(spark, sf).collect().map(_.toString)
    assert(served.toSeq == brute.toSeq,
      "artifact-served BM25 must equal the brute top-k on the fixture")
    // the query-time scan touches ONLY the query terms' postings: the
    // term IN (...) filter reaches the parquet scan as a pushed filter
    val dir = graft.operators.Curation.sharedBm25StatsDir(spark, sf)
    val probe = Curation.bm25FromIndex(spark, dir,
      Seq("data", "filter", "join"))
    val plan = planOf(probe)
    assert(plan.contains("PushedFilters: [In(term"),
      s"term filter must push into the postings scan:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a heap merge:\n$plan")
    // a directory without the _bm25_version marker (crashed or absent
    // build) refuses loudly
    val empty = graft.operators.ExportImport.scratch("bm25-stats/empty")
    val err = intercept[IllegalArgumentException] {
      Curation.bm25FromIndex(spark, empty, Seq("data"))
    }
    assert(err.getMessage.contains("_bm25_version"))
    // the artifact meta holds the exact corpus scalars
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("count(*)", "sum(size(split(lower(trim(text)), '\\\\s+')))")
      .collect().head
    assert(meta.getLong(0) == docs.getLong(0)
      && meta.getLong(1) == docs.getLong(1))
  }

  test("bm25_incremental: append equals rebuild — postings set, meta " +
      "sums, and the served list; replay never double-counts") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val terms = Seq("data", "filter", "join")
    // maintained artifact: base slice + one delta batch
    val incr = graft.operators.ExportImport.scratch("bm25-incr-spec")
    Curation.bm25StatsBuild(spark, docs.filter(col("doc_id") % 10 < 8),
      incr)
    Curation.bm25StatsAppend(spark, incr,
      docs.filter(col("doc_id") % 10 >= 8), batchId = 7L)
    // full rebuild over the whole corpus
    val full = graft.operators.ExportImport.scratch("bm25-full-spec")
    Curation.bm25StatsBuild(spark, docs, full)
    val servedIncr = Curation.bm25FromIndex(spark, incr, terms)
      .collect().map(_.toString).toSeq
    val servedFull = Curation.bm25FromIndex(spark, full, terms)
      .collect().map(_.toString).toSeq
    assert(servedIncr == servedFull,
      "maintained artifact must serve exactly like a full rebuild")
    // replay of the delta batch overwrites its subtree — serving
    // unchanged, documents never double-counted
    Curation.bm25StatsAppend(spark, incr,
      docs.filter(col("doc_id") % 10 >= 8), batchId = 7L)
    assert(Curation.bm25FromIndex(spark, incr, terms)
      .collect().map(_.toString).toSeq == servedFull,
      "replayed delta batch must leave the artifact unchanged")
    // appending to a dir that was never built refuses loudly
    val bad = graft.operators.ExportImport.scratch("bm25-incr-bad")
    intercept[IllegalArgumentException] {
      Curation.bm25StatsAppend(spark, bad, docs.limit(1))
    }
    // TORN APPEND: a crash between the postings write and the meta
    // write (the commit record) must leave an INVISIBLE delta — the
    // served list stays the committed artifact's, never a mix whose
    // idf/avgdl disagree with its postings
    val conf = spark.sparkContext.hadoopConfiguration
    val metaDelta = new org.apache.hadoop.fs.Path(
      s"$incr/meta_stream/batch_id=7")
    val before = Curation.bm25FromIndex(spark, incr, terms)
      .collect().map(_.toString).toSeq
    metaDelta.getFileSystem(conf).delete(metaDelta, true)
    val torn = Curation.bm25FromIndex(spark, incr, terms)
      .collect().map(_.toString).toSeq
    val baseOnly = {
      val b = graft.operators.ExportImport.scratch("bm25-base-spec")
      Curation.bm25StatsBuild(spark, docs.filter(col("doc_id") % 10 < 8),
        b)
      Curation.bm25FromIndex(spark, b, terms)
        .collect().map(_.toString).toSeq
    }
    assert(torn == baseOnly && torn != before,
      "uncommitted delta (postings without meta) must be excluded")
    // re-running the append commits it again — serving returns to full
    Curation.bm25StatsAppend(spark, incr,
      docs.filter(col("doc_id") % 10 >= 8), batchId = 7L)
    assert(Curation.bm25FromIndex(spark, incr, terms)
      .collect().map(_.toString).toSeq == servedFull,
      "re-appending the torn batch must recommit it")
  }

  test("retrieval_fuse_served: both-legs-artifact fusion equals the " +
      "brute fusion at full probes") {
    val brute = Curation.retrievalFuse(spark, sf).collect().map(_.toString)
    val served = Curation.retrievalFuseServed(spark, sf, nProbe = 16)
      .collect().map(_.toString)
    assert(served.toSeq == brute.toSeq,
      "full-probe both-legs-served fusion must equal the brute fusion")
    // production probes still return a fused top-k
    assert(Curation.retrievalFuseServed(spark, sf).collect().length <= 10)
  }

  test("retrieval_fuse_sq8: fusion over the sq8 vector leg equals the " +
      "both-legs-served fusion at full probes") {
    // full probes + exact re-rank to kLeg: the sq8 leg's ranked list
    // equals the exact one whenever the exact top-kLeg all sit inside
    // the sq8 top-8·kLeg (the ann_ivfsq8 equality stance feeding the
    // fuse); the lexical leg is the same artifact-served list
    val served = Curation.retrievalFuseServed(spark, sf, nProbe = 16)
      .collect().map(_.toString)
    val sq8 = Curation.retrievalFuseSq8(spark, sf, nProbe = 16)
      .collect().map(_.toString)
    assert(sq8.toSeq == served.toSeq,
      "full-probe sq8-leg fusion must equal the exact-leg fusion")
    // production probes still return a fused top-k
    assert(Curation.retrievalFuseSq8(spark, sf).collect().length <= 10)
  }

  test("mixture_temperature: sqrt flattens a 4:1 corpus to 2:1 budgets") {
    import spark.implicits._
    // src a: 4 docs x 100 tokens = 400; src b: 1 doc x 100 = 100
    val word100 = Seq.fill(100)("w").mkString(" ")
    val docs = ((1L to 4L).map(i => (i, "a", word100)) :+
      ((5L, "b", word100))).toDF("doc_id", "source", "text")
    val got = Curation.mixtureTemperatureFrom(docs, budgetTokens = 300L)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // w6(a)=20e6, w6(b)=10e6 -> budgets 300*2/3=200, 300*1/3=100
    assert(got("a") == ((400L, 200L, 2L, 200L)))
    assert(got("b") == ((100L, 100L, 1L, 100L)))
  }

  test("split_leakage: planted cross-split duplicates are counted exactly") {
    import spark.implicits._
    import graft.operators.Quality
    // find ids on each side of the split (knuth % 10)
    def knuth(id: Long): Long = {
      val h = (id * 2654435761L) & 0xFFFFFFFFL; h % 10
    }
    val evalIds = (1L to 200L).filter(knuth(_) == 0)
    val trainIds = (1L to 200L).filter(knuth(_) != 0)
    val (e1, e2, e3) = (evalIds(0), evalIds(1), evalIds(2))
    val (t1, t2) = (trainIds(0), trainIds(1))
    val long1 = (1 to 40).map(i => s"a$i").mkString(" ")
    val near1 = (1 to 40).map(i => if (i == 40) "zz" else s"a$i").mkString(" ")
    val docs = Seq(
      (t1, long1),                                  // train original
      (e1, long1),                                  // eval EXACT leak
      (e2, near1),                                  // eval NEAR leak
      (e3, "completely unrelated fresh words here"),
      (t2, "other train content entirely different"))
      .toDF("doc_id", "text")
    // sanity: spark's knuth32 agrees with the local replica
    val sparkSide = docs.select(col("doc_id"),
      pmod(Quality.knuth32(col("doc_id")), lit(10L)).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sparkSide(e1) == 0 && sparkSide(t1) != 0)
    val r = graft.operators.Curation.splitLeakageFrom(docs).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L) // train / eval
    assert(r.getLong(2) == 1L, "one exact leak")      // e1
    // e1 is ALSO a near-dup of t1 (identical text), e2 is near
    assert(r.getLong(3) == 2L, "two near leaks")
    assert(r.getLong(4) == 2L && r.getDouble(5) == 0.6667)
  }

  test("split_leakage: artifact-fed sfDir form == self-contained core") {
    // r20: the sfDir wrapper serves the near side from the session pair
    // artifact (raw-j filter at tau above the 0.3 floor) — pin it
    // bit-identical to the self-contained crossPairsFrom core
    val docs = Tables.load(spark, sf, "documents")
    assert(graft.operators.Curation.splitLeakage(spark, sf)
        .collect().toSeq
      == graft.operators.Curation.splitLeakageFrom(docs).collect().toSeq)
  }

  test("dsir_weights: target-like docs score positive; equals an independent reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t", "alpha beta alpha beta"),
      (2L, "t", "alpha alpha beta"),
      (3L, "o", "zulu yankee zulu zulu"),
      (4L, "o", "alpha zulu")).toDF("doc_id", "source", "text")
    val nB = 8
    val got = Curation.dsirWeightsFrom(docs, col("source") === "t", nB)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap

    // independent plain-Scala reference: same KR bucket, same smoothing
    def bucket(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 257 + c) % 18014398509481984L) % nB
    val toks = Seq(
      (1L, true, "alpha beta alpha beta"), (2L, true, "alpha alpha beta"),
      (3L, false, "zulu yankee zulu zulu"), (4L, false, "alpha zulu"))
      .flatMap { case (id, tgt, txt) =>
        txt.split("\\s+").map(w => (id, tgt, bucket(w)))
      }
    val byB = toks.groupBy(_._3)
    val nC = byB.view.mapValues(_.size.toLong).toMap
    val nT = byB.view.mapValues(_.count(_._2).toLong).toMap
    val (tC, tT) = (toks.size.toLong, toks.count(_._2).toLong)
    def r8(x: Double) = BigDecimal(x)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = toks.groupBy(_._1).map { case (id, ts) =>
      val s = ts.map { case (_, _, b) =>
        r8(math.log(((nT(b) + 1).toDouble / (tT + nB))
          / ((nC(b) + 1).toDouble / (tC + nB))))
      }.sum
      id -> ((ts.size.toLong, r4(s.toDouble / ts.size),
        r4(s.toDouble / ts.size) > 0))
    }
    assert(got == expect)
    // in-domain docs score positive and rank above the off-domain ones
    assert(got(1L)._2 > 0 && got(2L)._2 > 0 && got(3L)._2 < 0
      && got(4L)._2 < 0)
    assert(got(1L)._3 && !got(3L)._3)
  }

  test("leakage_safe_split: no verified pair ever crosses the split") {
    val split = Curation.leakageSafeSplit(spark, sf)
    val n = split.count()
    assert(n == Tables.load(spark, sf, "documents").count(),
      "every document gets exactly one split assignment")
    val pairs = Dedup.dedupNgramExactjoin(spark, sf)
    assert(pairs.count() > 0, "sf0.001 plants near-dups; guard non-vacuous")
    val sa = split.select(col("doc_id").as("id_a"), col("split").as("s_a"))
    val sb = split.select(col("doc_id").as("id_b"), col("split").as("s_b"))
    val crossing = pairs.join(sa, "id_a").join(sb, "id_b")
      .filter(col("s_a") =!= col("s_b")).count()
    assert(crossing == 0, s"$crossing near-dup pairs cross the split")
    // both splits are populated (mod=10 on ~500 clusters)
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.getOrElse("train", 0L) > 0 && bySplit.getOrElse("eval", 0L) > 0)
  }

  test("budget_select: equals the greedy reference; no global window") {
    val sel = Curation.budgetSelect(spark, sf)
    val got = sel.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // greedy reference: same score arithmetic via the shipped operator,
    // token counts recomputed locally, prefix in (score desc, doc_id)
    val toks = Tables.load(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").length.toLong).toMap
    val scores = graft.operators.TextAnalysis.qualityModel(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val order = toks.keys.toSeq.sortBy(id => (-scores(id), id))
    val total = toks.values.sum
    val budget = math.floor(total.toDouble * 0.5).toLong
    var cum = 0L
    val expect = order.flatMap { id =>
      cum += toks(id)
      if (cum <= budget) Some((id, scores(id), toks(id), cum)) else None
    }
    assert(got.toSeq == expect)
    assert(got.nonEmpty && got.map(_._3).sum <= budget,
      "selection spends at most the budget")
    // maximality: the next doc in order would overflow the budget
    val next = order.drop(expect.size).headOption
    next.foreach(id =>
      assert(expect.lastOption.map(_._4).getOrElse(0L) + toks(id) > budget))
    // scale shape: the cumsum must not plan a single-partition global
    // window (every Window here partitions by score)
    val p = planOf(sel)
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition(doc_id"),
      s"no global un-partitioned window expected:\n$p")
  }

  test("leakage_safe_split: FromPairs core equals the standalone query") {
    val docs = Tables.load(spark, sf, "documents").select(col("doc_id"))
    val pairs = Dedup.dedupNgramExactjoin(spark, sf)
    val viaPairs = Curation.leakageSafeSplitFrom(docs, pairs).collect().toSeq
    val standalone = Curation.leakageSafeSplit(spark, sf).collect().toSeq
    assert(viaPairs == standalone)
  }

  test("leakage_safe_split_composed: artifact-fed form equals standalone " +
      "and re-pays no prefix join on second use") {
    val composed = Curation.leakageSafeSplitComposed(spark, sf)
    val standalone = Curation.leakageSafeSplit(spark, sf).collect().toSeq
    assert(composed.collect().toSeq == standalone)
    // second call reuses the session artifact: the plan is a parquet
    // scan of the pair table, not the shingle/prefix join pipeline
    val again = Curation.leakageSafeSplitComposed(spark, sf)
    val p = again.queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("xxhash64"),
      s"composed split must read the pair artifact, not re-shingle:\n$p")
    assert(again.collect().toSeq == standalone)
  }

  test("contamination_report reconciles with the doc-level decontaminate") {
    val report = Curation.contaminationReport(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val hits = Curation.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcOf = Tables.load(spark, sf, "documents").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val train = srcOf.keys.filter(_ % 50 != 0).toSeq
    assert(report.values.map(_._1).sum == train.length)
    report.foreach { case (src, (nDocs, nContam, nGrams)) =>
      val docs = train.filter(srcOf(_) == src)
      assert(nDocs == docs.length, s"$src n_docs")
      assert(nContam == docs.count(hits.contains), s"$src n_contaminated")
      assert(nGrams == docs.flatMap(hits.get).sum, s"$src n_hit_grams")
    }
  }
}
