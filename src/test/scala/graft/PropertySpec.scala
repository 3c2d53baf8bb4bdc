package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{TopKAggregate, WordShinglesExpr}
import graft.operators.PackageFilter

/** Property-based checks (ScalaCheck generators, explicit seeds for
  * reproducibility): the custom expressions and the filter compiler
  * must agree with straightforward reference implementations on
  * arbitrary inputs, not just the fixtures. */
class PropertySpec extends SparkSpec {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("plannedBandRecall == exhaustive enumeration over all bit " +
      "placements, small universes") {
    // the closed form claims: P(at least one contiguous band clean |
    // h differing bits placed uniformly). Verify by brute force —
    // enumerate EVERY h-subset of totalBits positions and count the
    // placements that leave >= 1 band untouched.
    for {
      (bands, bits) <- Seq((2, 4), (4, 2), (8, 1), (3, 4), (6, 2))
      total = bands * bits
      h <- 1 to total
    } {
      val positions = (0 until total).toList
      val all = positions.combinations(h).toSeq
      val hit = all.count(c =>
        (0 until bands).exists(b =>
          !c.exists(p => p >= b * bits && p < (b + 1) * bits)))
      val expected = hit.toDouble / all.size
      val got = graft.operators.Dedup.plannedBandRecall(bands, bits, total, h)
      assert(math.abs(got - expected) < 1e-12,
        s"bands=$bands bits=$bits h=$h: closed $got vs brute $expected")
      // den = C(total, h) = the enumeration size, so the exact
      // rational must match the brute count EXACTLY
      val (num, den) = graft.operators.Dedup
        .plannedBandRecallExact(bands, bits, total, h)
      assert(num == BigInt(hit) && den == BigInt(all.size),
        s"exact rational $num/$den != $hit/${all.size}")
    }
  }

  test("bm25FromIndex == brute bm25SearchFrom restricted to matched " +
      "docs, arbitrary corpora and term bags") {
    import spark.implicits._
    val wordPool = Seq("data", "filter", "join", "spark", "row", "col",
      "the", "a")
    val docGen = Gen.nonEmptyListOf(Gen.oneOf(wordPool)).map(_.mkString(" "))
    (1L to 5L).foreach { seed =>
      val texts = sample(Gen.listOfN(12, docGen), seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val terms = sample(Gen.pick(2, wordPool.take(6)), seed).toSeq
      val dir = graft.operators.ExportImport.scratch(s"bm25-prop-$seed")
      graft.operators.Curation.bm25StatsBuild(spark, docs, dir)
      val served = graft.operators.Curation
        .bm25FromIndex(spark, dir, terms, k = 12)
        .collect().map(_.toString).toSeq
      // brute scores EVERY doc; the artifact's postings semantics keep
      // exactly the docs holding >= 1 query term, scores bit-identical
      val tfIdx = terms.indices
      val brute = graft.operators.Curation
        .bm25SearchFrom(docs, terms, k = 12)
        .collect()
        .filter(r => tfIdx.exists(i => r.getLong(2 + i) > 0))
        .map(_.toString).toSeq
      assert(served == brute, s"seed=$seed terms=$terms")
    }
  }

  test("WordShingles == naive sliding-window distinct, arbitrary word lists") {
    import spark.implicits._
    (1L to 30L).foreach { seed =>
      val ws = sample(Gen.listOf(word), seed)
      val expected =
        if (ws.length < 3) Seq.empty
        else ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
      val got = Seq(ws).toDF("w")
        .select(WordShinglesExpr.wordShingles(col("w"), 3).as("sh"))
        .collect().head.getSeq[String](0)
      assert(got == expected, s"words=$ws")
    }
  }

  test("PackageFilter range/negation == direct predicate, arbitrary bounds") {
    import spark.implicits._
    val values = (-5 to 105).toDF("v").cache()
    (1L to 20L).foreach { seed =>
      val a = sample(Gen.chooseNum(0, 100), seed)
      val b = sample(Gen.chooseNum(0, 100), seed + 1000)
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      val got = values.filter(PackageFilter.compile(col("v"), s"$lo..$hi"))
        .collect().map(_.getInt(0)).toSet
      assert(got == (lo to hi).toSet, s"range $lo..$hi")
      val gotNe = values.filter(PackageFilter.compile(col("v"), s"<>$lo"))
        .collect().map(_.getInt(0)).toSet
      assert(gotNe == (-5 to 105).toSet - lo, s"<>$lo")
    }
  }

  test("XmlNames: decode∘encode = id on arbitrary strings; encoded names are XML-safe") {
    val nasty = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '.', '_', 'x', '-', '/', '&', 'é', '漢'),
      Gen.const('_'))).map(_.mkString)
    (1L to 50L).foreach { seed =>
      val s = sample(nasty, seed)
      val enc = graft.sources.XmlNames.encode(s)
      assert(graft.sources.XmlNames.decode(enc) == s, s"name=<$s> enc=<$enc>")
      assert(enc.isEmpty || enc.matches("^[A-Za-z_].*"), s"bad start: <$enc>")
      assert(enc.forall(c => c.isLetterOrDigit && c < 128 || c == '_'),
        s"non-XML-safe char survives: <$enc>")
    }
    // the reference's own motivating cases
    assert(graft.sources.XmlNames.encode("No.") == "No_x002E_")
    assert(graft.sources.XmlNames.encode("Currency Code") == "Currency_x0020_Code")
    assert(graft.sources.XmlNames.encode("2. Priority") == "_x0032__x002E__x0020_Priority")
    assert(graft.sources.XmlNames.decode("_x0032__x002E__x0020_Priority") == "2. Priority")
  }

  test("KrHash == BigInt reference fold, arbitrary unicode strings") {
    import spark.implicits._
    import graft.functions.KrHashF
    val anyText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', 'é', '漢', 'ÿ', 'ሴ'),
      Gen.choose(' ', '߿'))).map(_.mkString)
    (1L to 40L).foreach { seed =>
      val s = sample(anyText, seed)
      val expected =
        if (s.isEmpty) 0L
        else s.codePoints().toArray.map(BigInt(_))
          .reduceLeft((a, c) => (a * KrHashF.B + c) % KrHashF.M).toLong
      val got = Seq(s).toDF("t")
        .select(KrHashF.krHash(col("t"))).collect().head.getLong(0)
      assert(got == expected, s"text=<$s>")
    }
  }

  test("TopKByScore == sort-and-take ranking, arbitrary scored sets with ties") {
    import spark.implicits._
    val pair = for {
      id <- Gen.chooseNum(0L, 30L)
      s <- Gen.oneOf(0.1, 0.5, 0.5, 0.9, 1.0) // deliberate tie mass
    } yield (id, s)
    (1L to 20L).foreach { seed =>
      val xs = sample(Gen.nonEmptyListOf(pair), seed).distinct
      val expected = xs.sortBy { case (id, s) => (-s, id) }.take(4)
      val got = xs.toDF("id", "s").repartition(3)
        .agg(graft.functions.TopKByScoreAgg.topkByScore(col("id"), col("s"), 4)
          .as("t"))
        .select(explode(col("t")).as("e"))
        .select("e.neighbor_id", "e.cos").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == expected, s"xs=$xs")
    }
  }

  test("NearestCells == naive argmax over the same centroid matrix") {
    import spark.implicits._
    val vec = Gen.listOfN(8, Gen.chooseNum(-5, 5).map(_.toFloat))
    val cents: Array[Array[Double]] = Array.tabulate(5, 8) {
      (c, d) => math.sin(c * 8 + d) // fixed, includes negatives
    }
    (1L to 20L).foreach { seed =>
      val v = sample(vec, seed).toArray
      val naive = cents.indices
        .map(c => c -> cents(c).zip(v).map { case (a, b) => a * b.toDouble }.sum)
        .sortBy { case (c, s) => (-s, c) }.take(3).map(_._1)
      val got = Seq(Tuple1(v)).toDF("e")
        .select(graft.functions.VectorQuantize.nearestCells(col("e"), cents, 3))
        .collect().head.getSeq[Int](0)
      assert(got == naive, s"v=${v.toSeq}")
    }
  }

  test("TopKFrequent == groupBy count ranking, arbitrary multisets") {
    import spark.implicits._
    (1L to 15L).foreach { seed =>
      val xs = sample(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e")),
        seed)
      val got = xs.toDF("v").repartition(3)
        .agg(TopKAggregate.topkFrequent(col("v"), 3).as("t"))
        .select(explode(col("t")).as("e")).select("e.item", "e.cnt")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val expected = xs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (item, n) => (-n, item) }.take(3)
      assert(got == expected, s"xs=$xs")
    }
  }

  test("Morton terms == reference bit interleave; bijective on 8-bit pairs") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.sum
    val coord = Gen.choose(0L, 255L)
    val pairs = (1L to 20L).map(s =>
      (sample(coord, s), sample(coord, 1000 + s)))
    val got = pairs.toDF("x", "y")
      .withColumn("z",
        expr(graft.operators.Maintenance.mortonTerms(8, "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 8), s"($x,$y)")
      assert(z >= 0 && z < 65536)
    }
    // bijection: the full 32x32 low square has 1024 distinct z values
    val grid = for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)
    val zs = grid.toDF("x", "y")
      .withColumn("z",
        expr(graft.operators.Maintenance.mortonTerms(8, "div")))
      .collect().map(_.getLong(2))
    assert(zs.distinct.length == 1024 && zs.forall(z => z >= 0 && z < 1024))
  }

  test("exact_substr_scrub: token accounting and rebuild agree with a " +
      "naive reference on arbitrary corpora") {
    import spark.implicits._
    import graft.operators.Dedup
    // small alphabet + short docs → collisions between docs are common,
    // so repeated 3-grams actually occur
    val tok = Gen.oneOf("aa", "bb", "cc", "dd")
    val doc = Gen.listOfN(12, tok).map(_.mkString(" "))
    (1L to 15L).foreach { seed =>
      val texts = sample(Gen.listOfN(6, doc), seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Dedup.exactSubstrScrubFrom(docs, n = 3, minCount = 2)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4)))
        .toMap
      // naive reference: count 3-grams corpus-wide, mark covered token
      // positions, rebuild from survivors
      val words = texts.map(_.split("\\s+").toSeq)
      val gramCounts = words.flatMap(w => w.sliding(3).map(_.mkString(" ")))
        .groupBy(identity).view.mapValues(_.size).toMap
      words.zipWithIndex.foreach { case (w, i) =>
        val covered = w.sliding(3).zipWithIndex.collect {
          case (g, p) if gramCounts(g.mkString(" ")) >= 2 =>
            p until (p + 3)
        }.flatten.toSet
        val kept = w.zipWithIndex.collect {
          case (t, p) if !covered(p) => t
        }
        val (nTok, keptTok, removed, scrubbed) = got(i.toLong)
        assert(nTok == w.length && keptTok == kept.length
          && removed == covered.size && scrubbed == kept.mkString(" "),
          s"seed=$seed doc=$i text='${texts(i)}' got=${got(i.toLong)} " +
            s"expect kept='${kept.mkString(" ")}'")
      }
    }
  }

  test("weightedSample == from-scratch ES ranking, arbitrary weighted populations") {
    import spark.implicits._
    // the reference replays the Knuth split-multiply and the ln(u)/w key
    // from first principles — no shared code with the operator
    def knuthRef(id: Long): Long = {
      val a = id % 4294967296L
      ((a % 65536L) * 2654435761L % 4294967296L
        + (a / 65536L) * 2654435761L % 65536L * 65536L) % 4294967296L
    }
    (1L to 8L).foreach { seed =>
      val n = sample(Gen.chooseNum(1, 40), seed)
      val weights = sample(Gen.listOfN(n, Gen.chooseNum(1L, 500L)), seed + 99)
      val k = sample(Gen.chooseNum(1, 10), seed + 500)
      val df = weights.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "w0")
      val got = graft.operators.Quality
        .weightedSampleFrom(df, col("w0"), k).collect()
        .map(r => r.getLong(1)).toSeq
      val want = weights.zipWithIndex.map { case (w, i) =>
        val u = (knuthRef(i.toLong) + 1).toDouble / 4294967297.0
        (i.toLong, math.log(u) / w)
      }.sortBy { case (id, key) => (-key, id) }.take(k).map(_._1)
      assert(got == want, s"seed=$seed n=$n k=$k: $got vs $want")
    }
  }

  test("Gini: in [0,1), scale-invariant, ordered against known extremes") {
    import spark.implicits._
    import graft.operators.Quality
    (1L to 10L).foreach { seed =>
      val lens = sample(Gen.nonEmptyListOf(Gen.choose(1L, 5000L)), seed)
      def giniOf(xs: Seq[Long]): (Double, Double, Double) = {
        val r = Quality.corpusConcentrationFrom(
          xs.zipWithIndex.toDF("len", "i"), col("len")).collect().head
        (r.getAs[Double]("gini6"), r.getAs[Double]("top1_share"),
          r.getAs[Double]("top10_share"))
      }
      val (g, t1, t10) = giniOf(lens)
      assert(g >= 0.0 && g < 1.0, s"gini=$g lens=$lens")
      assert(t1 <= t10 + 1e-9 && t10 <= 1.0, s"shares $t1/$t10")
      // scale invariance: tripling every length moves no statistic
      assert(giniOf(lens.map(_ * 3)) == ((g, t1, t10)), s"lens=$lens")
    }
  }

  test("parseSof: recovers geometry through arbitrary legal marker prefixes") {
    import graft.sources.JpegCodec
    // synthesize a minimal JPEG prefix: SOI, a random mix of APPn/COM/
    // DQT segments with random payloads (including 0xFF bytes inside the
    // payload — lengths, not byte-stuffing, delimit header segments),
    // then a SOFn frame header. The walk must recover (w, h, ncomp,
    // progressive) regardless of what precedes the SOF.
    def seg(mk: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, mk.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
    val segGen = for {
      mk <- Gen.oneOf((0xe0 to 0xef) ++ Seq(0xfe, 0xdb, 0xc4))
      n <- Gen.choose(0, 40)
      bytes <- Gen.listOfN(n, Gen.choose(0, 255))
    } yield seg(mk, bytes.map(_.toByte).toArray)
    (1L to 40L).foreach { seed =>
      val pre = sample(Gen.listOf(segGen), seed)
      val w = sample(Gen.choose(1, 65535), seed + 1)
      val h = sample(Gen.choose(1, 65535), seed + 2)
      val ncomp = sample(Gen.oneOf(1, 3), seed + 3)
      val prog = sample(Gen.oneOf(true, false), seed + 4)
      val sofPayload = Array[Byte](8) ++
        Array(((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
          ((w >> 8) & 0xff).toByte, (w & 0xff).toByte, ncomp.toByte) ++
        Array.fill[Byte](3 * ncomp)(0x11)
      val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
        pre.flatten ++ seg(if (prog) 0xc2 else 0xc0, sofPayload)
      val sof = JpegCodec.parseSof(jpeg)
      assert((sof.width, sof.height, sof.components, sof.progressive)
        == ((w, h, ncomp, prog)), s"seed=$seed prefixSegs=${pre.length}")
      // a DHT (0xc4) in the prefix must never be mistaken for a SOF:
      // segGen emits it freely and the assert above already proves it,
      // but the SOS-without-SOF guard must also stay loud
      val noSof = Array[Byte](0xff.toByte, 0xd8.toByte) ++ pre.flatten ++
        Array(0xff.toByte, 0xda.toByte, 0x00.toByte, 0x02.toByte)
      intercept[IllegalArgumentException](JpegCodec.parseSof(noSof))
    }
  }

  test("hdrBucket: lower bound within 1/16, exact below 32, monotone") {
    import spark.implicits._
    // reference: top-5-bits truncation via plain bit arithmetic
    def ref(v: Long): Long =
      if (v <= 31) v
      else { val sh = 64 - java.lang.Long.numberOfLeadingZeros(v) - 5
             (v >> sh) << sh }
    val gens = Gen.oneOf(
      Gen.choose(0L, 64L),                     // the exact/boundary zone
      Gen.choose(0L, 1L << 20),                // doc-length scale
      Gen.choose(0L, Long.MaxValue / 2))       // deep octaves
    val vs = (1L to 40L).flatMap(seed =>
      Seq(sample(gens, seed))) ++
      Seq(0L, 31L, 32L, 63L, 64L, 65L, (1L << 40) - 1, 1L << 40)
    val got = vs.toDF("v")
      .select(graft.operators.Sketches.hdrBucket.as("b"))
      .collect().map(_.getLong(0)).toSeq
    vs.zip(got).foreach { case (v, b) =>
      assert(b == ref(v), s"bucket($v)")
      assert(b <= v, s"bucket must lower-bound: $v")
      if (v <= 31) assert(b == v)
      else assert((v - b).toDouble / v < 1.0 / 16,
        s"bucket width violates 1/16 at $v")
    }
    // monotone: sorting by value never reorders buckets
    val byV = vs.zip(got).sortBy(_._1).map(_._2)
    assert(byV == byV.sorted, "bucket must be monotone in the value")
  }
}
