package graft

import graft.sources.MediaCodec
import graft.operators.Blob
import org.apache.spark.sql.functions._

/** The REAL PNG pixel codec (encode: all five RFC 2083 scanline
  * filters + Deflater; decode: chunk walk + CRC + Inflater +
  * de-filter) and the operators riding it. Interop is proven against
  * the JDK's own independent implementation (`javax.imageio`) in both
  * directions — our bytes decode under ImageIO, ImageIO's bytes decode
  * under us — so the codec is pinned to the PNG spec, not to itself. */
class MediaCodecSpec extends SparkSpec {

  private def testRgb(w: Int, h: Int): Array[Byte] = {
    // deterministic, high-entropy-ish raster touching all byte values
    val rgb = new Array[Byte](3 * w * h)
    var i = 0
    while (i < rgb.length) { rgb(i) = ((i * 131 + 17) % 256).toByte; i += 1 }
    rgb
  }

  test("WAV round-trip is sample-exact; corrupt headers fail loudly") {
    import graft.sources.WavCodec
    val pcm = Array.tabulate(777)(i => ((i * 2654435761L % 65536) - 32768).toShort)
    val wav = WavCodec.encodeWav(pcm, 16000)
    assert(wav.length == 44 + 777 * 2)
    val (sr, back) = WavCodec.decodeWav(wav)
    assert(sr == 16000 && back.toSeq == pcm.toSeq)
    // header verification is loud, not lenient
    val bad = wav.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](WavCodec.decodeWav(bad))
    val truncated = wav.take(wav.length - 2)
    intercept[IllegalArgumentException](WavCodec.decodeWav(truncated))
  }

  test("media_wav_stats: decoded-sample stats match a hand fold") {
    import graft.sources.WavCodec
    val text = "abc"
    val pcm = WavCodec.samplesOf(text)
    // 'a'=97 → (97−128)·256 = −7936; 'b' → −7680; 'c' → −7424
    assert(pcm.toSeq == Seq(-7936, -7680, -7424).map(_.toShort))
    val r = graft.operators.Blob.mediaWavStats(spark, sf).collect()
    assert(r.nonEmpty)
    val first = r.head
    assert(first.getAs[Int]("sample_rate") == 16000)
    assert(first.getAs[Long]("n_bytes") ==
      44 + 2 * first.getAs[Long]("n_samples"))
    assert(r.forall(_.getAs[Long]("peak") <= 32768))
    assert(r.forall(_.getAs[Double]("rms4") >= 0.0))
  }

  test("PNG round-trip is byte-exact under every filter type") {
    val (w, h) = (23, 11) // odd width: exercises non-aligned strides
    val rgb = testRgb(w, h)
    for (ft <- 0 to 4) {
      val png = MediaCodec.encodePng(w, h, rgb, _ => ft)
      val px = MediaCodec.decodePng(png)
      assert(px.width == w && px.height == h, s"filter $ft dims")
      assert(java.util.Arrays.equals(px.rgb, rgb), s"filter $ft pixels")
    }
    // and the default cycling policy (every row a different filter)
    val png = MediaCodec.encodePng(w, h, rgb)
    assert(java.util.Arrays.equals(MediaCodec.decodePng(png).rgb, rgb))
  }

  test("our PNG decodes identically under javax.imageio") {
    val (w, h) = (16, 7)
    val rgb = testRgb(w, h)
    val png = MediaCodec.encodePng(w, h, rgb)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO rejected our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val i = 3 * (w * y + x)
      assert(((argb >> 16) & 0xff) == (rgb(i) & 0xff), s"R at ($x,$y)")
      assert(((argb >> 8) & 0xff) == (rgb(i + 1) & 0xff), s"G at ($x,$y)")
      assert((argb & 0xff) == (rgb(i + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("ImageIO-written PNGs (RGB and RGBA) decode under our decoder") {
    val (w, h) = (9, 5)
    val rgb = testRgb(w, h)
    for (imgType <- Seq(java.awt.image.BufferedImage.TYPE_INT_RGB,
                        java.awt.image.BufferedImage.TYPE_INT_ARGB)) {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) {
        val i = 3 * (w * y + x)
        img.setRGB(x, y, 0xff000000 | ((rgb(i) & 0xff) << 16) |
          ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", out))
      val px = MediaCodec.decodePng(out.toByteArray) // RGBA drops alpha
      assert(px.width == w && px.height == h)
      assert(java.util.Arrays.equals(px.rgb, rgb), s"type $imgType pixels")
    }
  }

  test("decode fails loudly on corruption, never with garbage pixels") {
    val png = MediaCodec.encodePng(8, 8, testRgb(8, 8))
    // flip one IDAT payload byte → CRC must catch it
    val corrupt = png.clone()
    corrupt(50) = (corrupt(50) ^ 0x7f).toByte
    val e = intercept[IllegalArgumentException](MediaCodec.decodePng(corrupt))
    assert(e.getMessage.contains("CRC"))
    intercept[IllegalArgumentException](
      MediaCodec.decodePng("not a png at all".getBytes))
    intercept[IllegalArgumentException](
      MediaCodec.decodePng(java.util.Arrays.copyOf(png, 20))) // truncated
  }

  test("pngWrap geometry matches the BMP family; payload survives zlib") {
    val payload = ("The quick brown fox jumps over the lazy dog. " * 9).getBytes
    val png = MediaCodec.pngWrap(payload)
    assert(MediaCodec.sniff(png).contains(
      MediaCodec.Dims("image/png", 16,
        (payload.length + 47) / 48, 1)))
    val px = MediaCodec.decodePng(png)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOf(px.rgb, payload.length), payload))
    // text payload: the compressed file beats the raw raster
    assert(png.length < px.rgb.length,
      s"png ${png.length} >= raster ${px.rgb.length}")
  }

  test("resizePngHalf picks exactly every second pixel of every second row") {
    val (w, h) = (17, 9) // both odd: ceil-division edges on both axes
    val rgb = testRgb(w, h)
    val half = MediaCodec.resizePngHalf(MediaCodec.encodePng(w, h, rgb))
    val px = MediaCodec.decodePng(half)
    assert(px.width == 9 && px.height == 5)
    for (y <- 0 until px.height; x <- 0 until px.width; c <- 0 until 3) {
      val s = 3 * (w * 2 * y + 2 * x) + c
      val d = 3 * (px.width * y + x) + c
      assert(px.rgb(d) == rgb(s), s"pixel ($x,$y) channel $c")
    }
  }

  test("PixelDecoder reports decoded-raster dims through the seam") {
    val payload = "seam payload".getBytes
    val png = MediaCodec.pngWrap(payload)
    val m = Blob.PixelDecoder.decode(7L, png, "sha")
    assert(m.mime == "image/png" && m.width == 16 && m.height == 1)
    // non-PNG degrades to the header path, identically to HeaderDecoder
    val bmp = MediaCodec.encodeBmp(payload)
    assert(Blob.PixelDecoder.decode(7L, bmp, "sha")
      == Blob.HeaderDecoder.decode(7L, bmp, "sha"))
  }

  test("media_png_roundtrip: every doc lossless; file really compressed") {
    val df = Blob.mediaPngRoundtrip(spark, sf).cache()
    try {
      val n = df.count()
      assert(n > 0)
      assert(df.filter(!col("ok")).count() == 0, "a payload failed round-trip")
      // zlib wins on natural-language payloads once there is enough to
      // compress (fixed container overhead ~57 B dominates 1-2-row
      // rasters) — the container is not a fake wrapper around stored bytes
      assert(df.filter(col("raster_bytes") >= 480
        && col("png_bytes") >= col("raster_bytes")).count() == 0)
      assert(df.filter(col("raster_bytes") >= 480).count() > 0,
        "no doc large enough to exercise the compression claim")
    } finally { df.unpersist(); () }
  }

  test("media_resize_png: pixel-exact through two compression cycles") {
    val df = Blob.mediaResizePng(spark, sf)
    val bad = df.filter(!col("ok") || col("dst_w") =!= 8).count()
    assert(bad == 0)
  }

  test("JPEG: encode → own SOF walk + full decode recover the geometry") {
    import graft.sources.JpegCodec
    val w = 16; val h = 7
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 31 + 7) % 251).toByte)
    val jpg = JpegCodec.encodeJpeg(w, h, rgb)
    // container really is a JFIF stream with our geometry in its SOF
    val sof = JpegCodec.parseSof(jpg)
    assert((sof.width, sof.height, sof.components) == ((w, h, 3)))
    assert(!sof.progressive, "JDK writer emits baseline SOF0")
    // the lossy cycle returns the same raster shape with bounded error
    val px = JpegCodec.decodeJpeg(jpg)
    assert((px.width, px.height) == ((w, h)))
    val mae = rgb.indices.map(i =>
      math.abs((rgb(i) & 0xff) - (px.rgb(i) & 0xff))).sum.toDouble / rgb.length
    assert(mae < 48.0, s"lossy error out of control: mae=$mae")
    // sniff sees the new leg without disturbing PNG/BMP
    assert(graft.sources.MediaCodec.sniff(jpg)
      .contains(graft.sources.MediaCodec.Dims("image/jpeg", w, h, 1)))
  }

  test("JPEG: marker walk and decode fail loudly on non-JPEG bytes") {
    import graft.sources.JpegCodec
    intercept[IllegalArgumentException](
      JpegCodec.parseSof("not a jpeg".getBytes))
    intercept[IllegalArgumentException](
      JpegCodec.decodeJpeg(Array.fill[Byte](64)(0x42)))
    // truncated before any SOF: loud, not a zero-dims guess
    val jpg = JpegCodec.encodeJpeg(4, 4, new Array[Byte](48))
    intercept[Exception](JpegCodec.parseSof(jpg.take(6)))
  }

  test("media_jpeg_stats: geometry agrees both ways on every doc") {
    val df = Blob.mediaJpegStats(spark, sf).cache()
    try {
      assert(df.count() > 0)
      assert(df.filter(!col("decode_ok")).count() == 0)
      // text-byte rasters are high-entropy, so DCT at q=0.9 need not
      // beat raw size (unlike zlib in the PNG leg) — but the container
      // must stay within a bounded constant factor of the raster, or
      // the encoder is emitting something other than the image
      assert(df.filter(col("jpeg_bytes") > col("height") * 48 * 4 + 2048)
        .count() == 0)
      // lossy error bounded on every doc
      assert(df.filter(col("mae") >= 48.0).count() == 0)
    } finally { df.unpersist(); () }
  }

  test("dhash56: invariant to brightness offset, flips on structure change") {
    // dHash compares ADJACENT samples, so a constant brightness shift
    // (no clipping) must not move a single bit — the property that
    // makes it a perceptual hash rather than a checksum
    val base = MediaCodec.Pixels(16, 8, testRgb(16, 8))
    val brighter = MediaCodec.Pixels(16, 8,
      base.rgb.map(b => math.min(255, (b & 0xff) / 2 + 40).toByte))
    val dimmed = MediaCodec.Pixels(16, 8,
      base.rgb.map(b => ((b & 0xff) / 2).toByte))
    assert(MediaCodec.dhash56(dimmed) == MediaCodec.dhash56(
      MediaCodec.Pixels(16, 8, dimmed.rgb.map(b => ((b & 0xff) + 40).toByte))))
    assert(MediaCodec.dhash56(brighter) != 0L)
    // reversing each row's gradient flips comparison bits
    val reversed = {
      val r = new Array[Byte](base.rgb.length)
      for (y <- 0 until 8; x <- 0 until 16; c <- 0 until 3)
        r(3 * (16 * y + x) + c) = base.rgb(3 * (16 * y + (15 - x)) + c)
      MediaCodec.Pixels(16, 8, r)
    }
    assert(MediaCodec.dhash56(base) != MediaCodec.dhash56(reversed))
    // 56-bit contract: the sign bit (and bits 56-63) never set
    assert((MediaCodec.dhash56(base) >>> 56) == 0L)
  }

  test("media_phash_dedup: banded recall equals brute force on a crafted fixture") {
    import spark.implicits._
    // crafted corpus: two near-identical gradient pairs (small Hamming),
    // one far outlier; text length chosen so rasters span multiple rows
    val mk = (seed: Int, n: Int) =>
      (0 until n).map(i => ((i * 7 + seed) % 96 + 32).toChar).mkString
    val docs = Seq(
      (1L, mk(0, 160)), (2L, mk(0, 160)),            // identical → hamming 0
      (3L, mk(1, 160)), (4L, mk(1, 161)),            // near pair
      (5L, mk(37, 401))                              // different shape
    ).toDF("doc_id", "text")
    val fps = docs.as[(Long, String)].map { case (id, text) =>
      val raster = MediaCodec.grayRasterOf(text)
      val px = MediaCodec.decodePng(MediaCodec.encodePng(
        raster.width, raster.height, raster.rgb, _ => 0))
      (id, MediaCodec.dhash56(px))
    }.collect().toMap
    // brute-force truth at maxHamming=7
    val truth = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 7
    } yield (a, b, h)).toSet
    assert(truth.contains((1L, 2L, 0)), s"fixture must contain a 0-pair: $truth")
    val banded = graft.operators.Dedup
      .bandedHammingPairs(docs.as[(Long, String)].map { case (id, text) =>
        (id, MediaCodec.dhash56(MediaCodec.grayRasterOf(text)))
      }.toDF("doc_id", "fp"), bands = 8, bandBits = 7, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == truth, s"banded $banded != brute $truth")
  }

  test("media_phash_dedup: decoded-pixel hash equals raster hash on real docs") {
    // the PNG cycle is lossless, so hashing DECODED pixels must equal
    // hashing the synthesized raster — proves the container leg does
    // not perturb the fingerprint arithmetic the oracle replays
    import spark.implicits._
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().take(200).foreach { case (_, text) =>
        val raster = MediaCodec.grayRasterOf(text)
        val px = MediaCodec.decodePng(MediaCodec.encodePng(
          raster.width, raster.height, raster.rgb, _ => 0))
        assert(MediaCodec.dhash56(px) == MediaCodec.dhash56(raster))
      }
    // and the operator itself returns sane, ordered, deduped pairs
    val out = Blob.mediaPhashDedup(spark, sf).collect()
    assert(out.forall(r => r.getLong(0) < r.getLong(1)
      && r.getInt(2) >= 0 && r.getInt(2) <= 7))
  }

  test("energyFp56: gain-invariant, envelope-sensitive, banded == brute") {
    import graft.sources.WavCodec
    // rising-envelope signal: fingerprint should be all ones where
    // frames strictly grow
    val rising = Array.tabulate(570)(i => (i * 25).toShort)
    val fpR = WavCodec.energyFp56(rising)
    assert(fpR == (1L << 56) - 1, f"rising fp: $fpR%x")
    // uniform gain (integer doubling, no clipping) moves no bit
    val doubled = rising.map(s => (s * 2).toShort)
    assert(WavCodec.energyFp56(doubled) == fpR)
    // reversing the envelope flips every comparison
    assert(WavCodec.energyFp56(rising.reverse) == 0L)
    assert((fpR >>> 56) == 0L, "56-bit contract: sign byte clear")
    // banded pairs equal brute force on the real corpus (pigeonhole at
    // 14 bands x 4 bits, maxHamming 13)
    import spark.implicits._
    val fps = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().flatMap { case (id, text) =>
        val pcm = WavCodec.samplesOf(text)
        if (pcm.isEmpty) None else Some((id, WavCodec.energyFp56(pcm)))
      }.toMap
    val truth = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 13
    } yield (a, b, h)).toSet
    val banded = Blob.mediaWavFpDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == truth, s"banded ${banded.size} != brute ${truth.size}")
  }

  test("media_wav_fp_planned: 8x7 geometry — deterministic band rule, " +
      "pigeonhole-exact through Hamming 7, expected-vs-measured S-curve") {
    import graft.sources.WavCodec
    import spark.implicits._
    val fps = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().flatMap { case (id, text) =>
        val pcm = WavCodec.samplesOf(text)
        if (pcm.isEmpty) None else Some((id, WavCodec.energyFp56(pcm)))
      }.toMap
    val truth = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 13
    } yield (a, b, h)).toSet
    val planned = Blob.mediaWavFpPlanned(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the planned pair set is DETERMINISTIC: exactly the radius-13
    // pairs whose xor leaves at least one 7-bit band clean (the same
    // rule the DuckDB oracle replays)
    val bandRule = truth.filter { case (a, b, _) =>
      val x = fps(a) ^ fps(b)
      (0 until 8).exists(k => ((x >> (k * 7)) & 127L) == 0L)
    }
    assert(planned == bandRule,
      s"planned ${planned.size} != band-rule replay ${bandRule.size}")
    // pigeonhole: 8 bands cannot all be hit by <= 7 differing bits
    assert(truth.filter(_._3 <= 7).subsetOf(planned),
      "every pair within Hamming 7 must be surfaced")
    // the published closed-form S-curve (inclusion-exclusion pins)
    def rec(h: Int) = graft.operators.Dedup.plannedBandRecall(8, 7, 56, h)
    assert(rec(7) >= 1.0 - 1e-9, "exact through bands-1 by pigeonhole")
    assert(math.abs(rec(8) - 0.9959) < 5e-4, s"rec(8)=${rec(8)}")
    assert(math.abs(rec(13) - 0.7759) < 5e-4, s"rec(13)=${rec(13)}")
    (7 to 12).foreach(h => assert(rec(h) >= rec(h + 1),
      "expected recall must fall monotonically with distance"))
    // measured recall in the S-curve region vs the uniform-model
    // expectation over the SAME distance mix (both deterministic on
    // the fixed corpus; envelope bits aren't uniform, so allow a
    // modeling margin)
    val region = truth.filter(_._3 >= 8)
    if (region.nonEmpty) {
      val measured = planned.count(_._3 >= 8).toDouble / region.size
      val expected = region.toSeq.map(t => rec(t._3)).sum / region.size
      info(f"S-curve region: ${region.size} pairs, measured $measured%.4f," +
        f" expected $expected%.4f")
      assert(measured >= expected - 0.15 && measured <= 1.0,
        f"measured $measured%.4f vs expected $expected%.4f")
    }
  }

  test("hamming_plan: exact recall rationals, pigeonhole rows, " +
      "data-driven candidate volume") {
    import graft.sources.WavCodec
    import spark.implicits._
    val rows = Blob.hammingPlan(spark, sf).collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((2, 28), (4, 14), (7, 8), (8, 7), (14, 4), (28, 2), (56, 1)))
    rows.foreach { r =>
      val (bands, bits) = (r.getInt(0), r.getInt(1))
      assert(r.getInt(2) == bands - 1, "exact radius is bands - 1")
      val (num, den) = (r.getLong(7), r.getLong(8))
      assert(num > 0 && num <= den, s"recall rational in (0, 1]: $num/$den")
      // the published rational IS the double curve
      val d = graft.operators.Dedup.plannedBandRecall(bands, bits, 56, 13)
      assert(math.abs(num.toDouble / den.toDouble - d) < 1e-12)
      // pigeonhole: 13 differing bits cannot hit > 13 bands
      if (bands > 13) assert(num == den, s"$bands bands must be exact at 13")
      else assert(num < den, s"$bands bands cannot be exact at 13")
    }
    // candidate volume replays against driver-side band-bucket counts
    val fps = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().flatMap { case (id, text) =>
        val pcm = WavCodec.samplesOf(text)
        if (pcm.isEmpty) None else Some((id, WavCodec.energyFp56(pcm)))
      }
    def volume(bands: Int, bits: Int): Long =
      (0 until bands).map { b =>
        fps.groupBy { case (_, fp) => (fp >> (b * bits)) & ((1L << bits) - 1) }
          .values.map(g => g.size.toLong * (g.size - 1) / 2).sum
      }.sum
    rows.foreach { r =>
      assert(r.getLong(3) == volume(r.getInt(0), r.getInt(1)),
        s"cand_rows mismatch at ${r.getInt(0)}x${r.getInt(1)}")
    }
    // the trade the planner navigates: 1-bit bands are the candidate
    // blow-up end, 28-bit bands the selective end
    assert(rows.last.getLong(3) >= rows.head.getLong(3),
      "56x1 must cost at least as many candidate rows as 2x28")
  }

  test("media_phash_clusters: components closed over the phash pairs") {
    val pairs = Blob.mediaPhashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = Blob.mediaPhashClusters(spark, sf).collect()
    assert(got.length == Tables.load(spark, sf, "documents").count())
    val label = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every near-dup image pair lands in one cluster
    pairs.foreach { case (a, b) => assert(label(a) == label(b)) }
    // cluster id is the min member; sizes and canonical flags agree
    val byCluster = got.groupBy(_.getLong(1))
    assert(byCluster.forall { case (cid, ms) =>
      ms.map(_.getLong(0)).min == cid &&
        ms.forall(_.getLong(2) == ms.length) &&
        ms.forall(r => r.getBoolean(3) == (r.getLong(0) == cid))
    })
    assert(byCluster.exists(_._2.length > 1),
      "fixture must contain at least one multi-image cluster")
  }
}
