package graft

import org.apache.spark.sql.functions._
import graft.functions.{Codec, MinHash, SimHash, WordShinglesExpr}
import graft.operators.Dedup

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("Base64NoWrap equals canonical java.util.Base64 (never MIME-wrapped)") {
    val long = ("x" * 500)
    val rows = Seq("", "a", "hello world", long).toDF("s")
      .select(col("s"), Codec.base64NoWrap(col("s").cast("binary")).as("b"))
      .collect()
    rows.foreach { r =>
      val expected = java.util.Base64.getEncoder
        .encodeToString(r.getString(0).getBytes("UTF-8"))
      assert(r.getString(1) == expected)
    }
  }

  test("MinHashSignature equals the composed built-in form") {
    val df = Seq(Seq(17L, 4242L, 999999L), Seq(1L), Seq.empty[Long])
      .toDF("hx")
    val native = df.select(
      MinHash.minhashSignature(col("hx"), Dedup.perms, 2147483647L).as("sig"))
      .collect().map(_.getSeq[Long](0))
    val aArr = array(Dedup.perms.map(p => lit(p._1)): _*)
    val bArr = array(Dedup.perms.map(p => lit(p._2)): _*)
    val composed = df.select(
      transform(sequence(lit(0), lit(63)), i =>
        array_min(transform(col("hx"), x =>
          pmod(element_at(aArr, i + 1) * x + element_at(bArr, i + 1),
            lit(2147483647L))))).as("sig"))
      .collect().map(_.getSeq[Any](0))
    // non-empty inputs must agree exactly (empty: composed yields nulls,
    // native yields Long.MaxValue sentinels — both land in no real bucket)
    native.zip(composed).take(2).foreach { case (n, c) =>
      assert(n == c.map(_.asInstanceOf[Long]))
    }
  }

  test("Sq8Dequant: cos(x, dq(x)) is 1 - distortion bit-for-bit; " +
      "quantization error bounded by maxabs/254; null slots propagate") {
    import graft.functions.Sq8Dequant
    // exact-arithmetic identity with the QuantizeDistortion kernel:
    // the dequant + dot route is the serving pipelines' arithmetic
    val df = Seq(Seq(0.5, -1.25, 3.0, 0.001), Seq(1.0, 1.0, 1.0, 1.0))
      .toDF("e")
    val dotc = graft.functions.DotProduct.dot _
    df.select(Sq8Dequant.dequant(col("e")).as("d"), col("e"))
      .select(
        (dotc(col("e"), col("d"))
          / (sqrt(dotc(col("e"), col("e")))
             * sqrt(dotc(col("d"), col("d"))))).as("c"),
        graft.functions.QuantizeI8.distortion(col("e")).as("dist"),
        col("e"), col("d"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - (1.0 - r.getDouble(1))) < 1e-12)
        // per-element reconstruction error <= maxabs/254 (half a step)
        val e = r.getSeq[Double](2); val d = r.getSeq[Double](3)
        val bound = e.map(math.abs).max / 254.0 + 1e-15
        e.zip(d).foreach { case (x, y) =>
          assert(math.abs(x - y) <= bound, s"|$x - $y| > $bound")
        }
      }
    // null element slot -> NULL vector (the DotProduct stance)
    val rows = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a")
      .select(Sq8Dequant.dequant(col("a")).as("s"))
      .collect().head
    assert(rows.isNullAt(0), "null element slot must yield NULL")
  }

  test("WordShingles equals distinct 3-grams, first-occurrence order") {
    val df = Seq("a b c d a b c d", "x y", "").toDF("t")
      .select(WordShinglesExpr.wordShingles(split(col("t"), " "), 3).as("sh"))
    val out = df.collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d", "c d a", "d a b"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty)
  }

  test("SimHashBits equals the per-bit majority definition") {
    val hx = Seq(Seq(0xF0F0L, 0xF000L, 0xF010L)) // bit votes: known majority
    val bits = hx.toDF("hx")
      .select(SimHash.simhashBits(col("hx")).as("b"))
      .collect().head.getSeq[Int](0)
    (0 until 64).foreach { k =>
      val votes = hx.head.count(h => ((h >>> k) & 1L) == 1L)
      assert(bits(k) == (if (votes * 2 > hx.head.size) 1 else 0), s"bit $k")
    }
  }
}
