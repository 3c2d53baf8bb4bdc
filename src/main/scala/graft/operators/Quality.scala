package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Filtering.cents

/** Data-quality / pre-migration checks: referential integrity,
  * deterministic sampling, value histograms, column profiling — the
  * checks a migration operator runs BEFORE applying a package (the
  * reference's validation surface generalized to table-level audits).
  *
  * All four are single-pass or single-join shapes that hold at 100 TB:
  * an anti join on the key, a map-only arithmetic filter, one hash
  * aggregate, and one multi-aggregate pass stacked into rows.
  */
object Quality {

  /** §2 #56 — referential-integrity audit: child rows whose parent key
    * is missing. Parents are deterministically thinned (keys % 97
    * dropped) so the check has something to find; the real shape is the
    * left-anti join on the key — one co-partitioned exchange, no
    * row explosion at any scale. */
  def fkOrphans(spark: SparkSession, sfDir: String): DataFrame = {
    val parents = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"))
      .join(parents, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_lines"),
        countDistinct(col("l_orderkey")).as("n_orphan_keys"),
        min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"))
  }

  /** Knuth multiplicative hash — pure 64-bit arithmetic, so the SAME
    * rows are selected by any engine, any run, any partitioning. */
  private val KnuthA = 2654435761L
  private val Mod32 = 4294967296L

  /** §2 #57 — deterministic systematic sample (~pct% of rows by key):
    * the reproducible debug/preview slice a pipeline run logs. Unlike
    * TABLESAMPLE/rand(), membership is a pure function of the key —
    * map-only, pushdown-eligible, identical across engines. */
  def deterministicSample(spark: SparkSession, sfDir: String,
                          pct: Int = 10): DataFrame = {
    require(pct >= 1 && pct <= 100)
    Tables.load(spark, sfDir, "orders")
      .filter(pmod(col("o_orderkey") * KnuthA, lit(Mod32))
        < lit(Mod32 / 100 * pct))
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
      .orderBy("o_orderkey")
  }

  /** §2 #58 — fixed-width value histogram (distribution profile of the
    * events value column, in cents): one hash aggregate over a map-only
    * bin computation. */
  def valueHistogram(spark: SparkSession, sfDir: String,
                     binWidth: Long = 2500L): DataFrame =
    Tables.load(spark, sfDir, "events")
      .select(cents(col("value")).as("v_c"))
      .groupBy(floor(col("v_c") / lit(binWidth.toDouble)).cast("long")
        .as("bin"))
      .agg(count(lit(1)).as("n"),
        min("v_c").as("min_c"), max("v_c").as("max_c"))
      .orderBy("bin")

  /** §2 #59 — column profile of the orders table: rows, nulls, distinct
    * count, min/max per column — the summary a migration pre-check
    * prints. ONE pass over the data (a single multi-aggregate), stacked
    * into per-column rows afterwards; doubles surface as exact cents
    * and timestamps as formatted days so the text is engine-stable. */
  def profileTable(spark: SparkSession, sfDir: String): DataFrame = {
    val df = Tables.load(spark, sfDir, "orders")
    // (column, min-as-text, max-as-text) with type-aware formatting
    def txt(c: String, f: Column => Column): (Column, Column) =
      (f(min(col(c))).cast("string"), f(max(col(c))).cast("string"))
    val specs: Seq[(String, (Column, Column))] = Seq(
      "o_orderkey" -> txt("o_orderkey", identity),
      "o_custkey" -> txt("o_custkey", identity),
      "o_orderstatus" -> txt("o_orderstatus", identity),
      "o_totalprice" ->
        (cents(min(col("o_totalprice"))).cast("string"),
          cents(max(col("o_totalprice"))).cast("string")),
      "o_orderdate" ->
        (date_format(min(col("o_orderdate")), "yyyy-MM-dd"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd")),
      "o_orderpriority" -> txt("o_orderpriority", identity))

    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: specs.flatMap {
      case (c, (mn, mx)) => Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        mn.as(s"${c}__mn"), mx.as(s"${c}__mx"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = specs.map { case (c, _) =>
      s"'$c', ${c}__nulls, ${c}__nd, ${c}__mn, ${c}__mx"
    }.mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${specs.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_txt, max_txt)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_txt"), col("max_txt"))
      .orderBy("col_name")
  }

  /** Oracle twin of [[profileTable]] (UNION ALL, one leg per column). */
  val profileOracle: String = {
    def leg(c: String, mn: String, mx: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
          count(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
          count(DISTINCT $c) AS n_distinct,
          $mn AS min_txt, $mx AS max_txt FROM orders"""
    val legs = Seq(
      leg("o_orderkey", "CAST(min(o_orderkey) AS VARCHAR)",
        "CAST(max(o_orderkey) AS VARCHAR)"),
      leg("o_custkey", "CAST(min(o_custkey) AS VARCHAR)",
        "CAST(max(o_custkey) AS VARCHAR)"),
      leg("o_orderstatus", "CAST(min(o_orderstatus) AS VARCHAR)",
        "CAST(max(o_orderstatus) AS VARCHAR)"),
      leg("o_totalprice",
        "CAST(CAST(round(min(o_totalprice)*100) AS BIGINT) AS VARCHAR)",
        "CAST(CAST(round(max(o_totalprice)*100) AS BIGINT) AS VARCHAR)"),
      leg("o_orderdate", "strftime(min(o_orderdate), '%Y-%m-%d')",
        "strftime(max(o_orderdate), '%Y-%m-%d')"),
      leg("o_orderpriority", "CAST(min(o_orderpriority) AS VARCHAR)",
        "CAST(max(o_orderpriority) AS VARCHAR)"))
    legs.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")
  }
}
