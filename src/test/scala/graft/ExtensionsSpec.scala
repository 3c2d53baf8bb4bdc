package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  // extensions are applied at session INSTANTIATION — getOrCreate would
  // silently reuse another suite's extension-less session, so clear the
  // default/active sessions first (the SparkContext is still shared)
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    Tables.configure(SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
  }

  test("SQL users can call the graft expressions by name") {
    import spark.implicits._
    Seq(("hello world fine day", 1)).toDF("t", "i")
      .createOrReplaceTempView("ext_docs")
    val row = spark.sql(
      """SELECT base64_nowrap(CAST(t AS BINARY)) AS b64,
                word_shingles(split(t, ' '), 3) AS sh,
                minhash_signature(transform(word_shingles(split(t, ' '), 3),
                  s -> pmod(hash(s), 2147483647L))) AS sig,
                simhash_bits(transform(word_shingles(split(t, ' '), 3),
                  s -> xxhash64(s))) AS bits
         FROM ext_docs""").collect().head
    assert(row.getAs[String]("b64") ==
      java.util.Base64.getEncoder.encodeToString(
        "hello world fine day".getBytes("UTF-8")))
    assert(row.getSeq[String](1) ==
      Seq("hello world fine", "world fine day"))
    assert(row.getSeq[Long](2).length == 64)
    assert(row.getSeq[Int](3).length == 64)
  }

  test("kr_hash and simhash_fp are SQL-callable and match the library values") {
    import spark.implicits._
    Seq(("abc", 1)).toDF("t", "i").createOrReplaceTempView("ext_kr")
    val row = spark.sql(
      """SELECT kr_hash(t) AS h,
                simhash_fp(array(kr_hash(t))) AS fp
         FROM ext_kr""").collect().head
    // fold by hand: 'a'=97 'b'=98 'c'=99 → (97*257 + 98)*257 + 99
    val expected = ((97L * 257 + 98) * 257 + 99) % graft.functions.KrHashF.M
    assert(row.getLong(0) == expected)
    // a single hash votes all its own bits through
    assert(row.getLong(1) == expected)
  }

  test("topk_frequent aggregate equals GROUP BY/LIMIT") {
    import spark.implicits._
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d")).toDF("v")
    val top = df.agg(graft.functions.TopKAggregate.topkFrequent(col("v"), 2)
      .as("t")).select(explode(col("t")).as("e"))
      .select("e.item", "e.cnt").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq(("a", 5L), ("b", 3L))) // ties: item asc
  }

  test("topk_frequent fails loudly past the exactness bound") {
    import spark.implicits._
    val df = (1 to 100).map(_.toString).toDF("v")
    val ex = intercept[Exception] {
      df.agg(graft.functions.TopKAggregate.topkFrequent(col("v"), 3, maxDict = 10))
        .collect()
    }
    assert(ex.getMessage.contains("dictionary exceeded")
      || ex.getCause != null)
  }

  test("dot_product propagates NULL for null element slots (SQL arrays)") {
    // array(1.0, NULL) is containsNull=true: the old kernel read the
    // null slot as 0.0 and returned a silently wrong number
    val rows = spark.sql(
      """SELECT dot_product(array(1.0D, CAST(NULL AS DOUBLE)),
                            array(2.0D, 3.0D)) AS withnull,
                dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS clean"""
    ).collect().head
    assert(rows.isNullAt(0), "null element slot must yield NULL")
    assert(rows.getDouble(1) == 11.0)
  }

  test("dot_product still fails loudly on ragged lengths") {
    val ex = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0D), array(1.0D, 2.0D))")
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(ex).exists(m => m != null && m.contains("lengths differ")))
  }

  test("char_entropy is SQL-callable and matches the library kernel") {
    val row = spark.sql(
      "SELECT round(char_entropy('ab'), 4) AS coin, " +
        "char_entropy('aaaa') AS flat, " +
        "char_entropy(CAST(NULL AS STRING)) AS missing").collect().head
    assert(row.getDouble(0) == 1.0 && row.getDouble(1) == 0.0 && row.isNullAt(2))
  }

  test("nfc_normalize is SQL-callable and composes decomposed sequences") {
    val row = spark.sql(
      "SELECT nfc_normalize('café') AS n, " +
        "length(nfc_normalize('café')) AS l").collect().head
    assert(row.getString(0) == "café" && row.getInt(1) == 4)
  }

  test("sketch aggregates are SQL-callable and match the library path") {
    import spark.implicits._
    val vals = (1 to 500).map(i => (i * 7919L) % 263L)
    vals.toDF("v").createOrReplaceTempView("sk_vals")
    // min_k_distinct: SQL == sort-distinct-take-k
    val mk = spark.sql("SELECT min_k_distinct(v, 10) AS mk FROM sk_vals")
      .collect()(0).getSeq[Long](0)
    assert(mk == vals.distinct.sorted.take(10))
    // hll_sketch / hll_regs: SQL == the DataFrame-API aggregate
    val gs = (1 to 2000).map(i => graft.functions.SketchHash.mix(i * 1299721L))
    gs.toDF("g").createOrReplaceTempView("sk_gs")
    val sqlRow = spark.sql(
      "SELECT hll_sketch(g).n_regs_zero AS z, hll_sketch(g).s_scaled AS s, " +
      "hll_regs(g) AS r FROM sk_gs").collect()(0)
    val apiRow = gs.toDF("g")
      .agg(graft.functions.SketchAggregates.hll(col("g")).as("h"),
        graft.functions.SketchAggregates.hllRegs(col("g")).as("r"))
      .select(col("h.n_regs_zero"), col("h.s_scaled"), col("r")).collect()(0)
    assert(sqlRow.getInt(0) == apiRow.getInt(0))
    assert(sqlRow.getLong(1) == apiRow.getLong(1))
    assert(sqlRow.getSeq[Int](2) == apiRow.getSeq[Int](2))
    // topk_frequent: SQL == GROUP BY count / order / limit
    Seq.fill(5)("a").++(Seq.fill(3)("b")).++(Seq("c"))
      .toDF("v").createOrReplaceTempView("sk_top")
    val top = spark.sql(
      "SELECT inline(topk_frequent(v, 2)) FROM sk_top").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("a", 5L), ("b", 3L)))
  }

  test("mis-aritied graft SQL functions raise WRONG_NUM_ARGS, not NoSuchElement") {
    for (bad <- Seq("dot_product(array(1.0D))", "dot_product()",
                    "kr_hash()", "base64_nowrap()", "nfc_normalize()",
                    "hll_sketch()", "min_k_distinct(1)")) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $bad").collect()
      }
      assert(ex.getErrorClass != null &&
        ex.getErrorClass.startsWith("WRONG_NUM_ARGS"),
        s"$bad raised ${ex.getErrorClass}: ${ex.getMessage}")
    }
  }

  test("literal-k builders: BIGINT literal narrows, non-literal k raises " +
      "NON_FOLDABLE_ARGUMENT") {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("v").createOrReplaceTempView("sk_k")
    // an INT-ranged BIGINT literal is accepted and narrowed
    val mk = spark.sql(
      "SELECT min_k_distinct(v, CAST(2 AS BIGINT)) FROM sk_k")
      .collect().head.getSeq[Long](0)
    assert(mk == Seq(1L, 2L))
    // a non-foldable k gets Spark's own error, not a ClassCastException
    for (bad <- Seq("min_k_distinct(v, v)", "topk_frequent(v, v)",
                    "word_shingles(array('a','b'), CAST(v AS INT))",
                    "min_k_distinct(v, 1.5)")) {
      val ex = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"SELECT $bad FROM sk_k").collect()
      }
      assert(ex.getErrorClass == "NON_FOLDABLE_ARGUMENT",
        s"$bad raised ${ex.getErrorClass}: ${ex.getMessage}")
    }
  }
}
