package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scan-shaping operators: filters, projections, typed formatting,
  * column mapping, preview sampling.
  *
  * Reference semantics (studied, not copied):
  *  - record filters per table: Codeunit 60000 - Config. XML Exchange.al:141
  *    `ApplyPackageFilter` (field-level SETFILTER before export)
  *  - field include/exclude: Codeunit 60000:800 `ExcludeRemovedFields`
  *  - locale-safe typed value round-trip: Codeunit 60000:826 `FormatFieldValue`
  *  - import column mapping: Codeunit 60001:687 `InitColumnMapping`
  *  - key/preview sampling: Codeunit 60001:272/296
  *
  * Spark-first: all of these are declarative `filter`/`select` so Catalyst
  * pushes predicates and prunes columns at the parquet scan — the 100 TB
  * version reads only the bytes it needs.
  */
object Filtering {

  /** Cents-exact money helper: per-row double→integer-cents conversion is
    * IEEE-deterministic, so BIGINT sums are associative and engine-portable
    * (raw double sums are not). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** §2 #4 — filtered export. Predicates all reach the parquet scan. */
  def filterPushdown(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_returnflag") === "R" && col("l_quantity") > 30)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        cents(col("l_quantity")).as("qty_cents"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .orderBy("l_orderkey", "l_linenumber")

  /** §2 #5 — field include/exclude as column pruning at the scan. */
  def projection(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .orderBy("p_partkey")

  /** §2 #6 — typed value format + re-parse round-trip (Date/DateTime/
    * Decimal/Boolean), all codegen'd built-ins. `fmt_ok` proves the parse
    * inverts the format, the declarative analog of FormatFieldValue's
    * XML-mode/Excel-mode dual formatting. */
  def typedFormat(spark: SparkSession, sfDir: String): DataFrame = {
    val dtTxt = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss")
    Tables.load(spark, sfDir, "orders")
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_txt"),
        dtTxt.as("dt_txt"),
        cents(col("o_totalprice")).as("price_cents"),
        (col("o_orderstatus") === "F").as("is_final"),
        (to_timestamp(dtTxt, "yyyy-MM-dd'T'HH:mm:ss") === col("o_orderdate"))
          .as("fmt_ok"))
      .orderBy("o_orderkey")
  }

  /** §2 #7 — import column-mapping (schema-evolution rename). A pure
    * metadata operation: zero shuffle, zero data rewrite. */
  val orderColumnMapping: Seq[(String, String)] = Seq(
    "o_orderkey" -> "order_id", "o_custkey" -> "customer_id",
    "o_orderstatus" -> "status", "o_totalprice" -> "total_price",
    "o_orderpriority" -> "priority")

  def columnMapping(spark: SparkSession, sfDir: String): DataFrame = {
    val mapped = orderColumnMapping.map { case (from, to) => col(from).as(to) }
    Tables.load(spark, sfDir, "orders")
      .select(mapped: _*)
      .withColumn("total_price", cents(col("total_price")))
      .orderBy("order_id")
  }

  /** §2 #13 — key/preview sampling: first N records in key order, keys +
    * leading fields only (never a full materialization). */
  def previewSample(spark: SparkSession, sfDir: String, n: Int = 20): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
      .orderBy("o_orderkey")
      .limit(n)
}
