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
}
