package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Filtering.cents

/** §2 #38 — merge/upsert import: apply an incoming package of records to
  * an existing table, new versions winning by primary key.
  *
  * Reference semantics: importing a package INSERTs new records and
  * MODIFYs existing ones (Codeunit 60000:419 `ImportPackageXML` →
  * ApplyPackageRecords path). Declarative re-expression: union both
  * sides tagged with a version, keep the highest-version row per key
  * via one window — a single shuffle on the key, the standard lakehouse
  * upsert shape (same plan a MERGE INTO compiles to without a
  * transaction log).
  */
object MergeImport {

  def upsert(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    val tagged = existing.withColumn("_v", lit(0))
      .unionByName(incoming.withColumn("_v", lit(1)))
    val latest = Window.partitionBy(key).orderBy(col("_v").desc)
    tagged
      .withColumn("_rn", row_number().over(latest))
      .filter(col("_rn") === 1)
      .drop("_v", "_rn")
  }

  /** Query: simulate an update package — every order with key divisible
    * by 10 arrives re-priced (+1000.00) and re-statused to 'U', plus the
    * merge must keep every untouched order byte-identical. */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val incoming = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .withColumn("o_orderstatus", lit("U"))
    upsert(orders, incoming, "o_orderkey")
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
      .orderBy("o_orderkey")
  }

  val oracle: String =
    """SELECT o_orderkey,
        CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END
          AS o_orderstatus,
        CAST(round(CASE WHEN o_orderkey % 10 = 0
                        THEN o_totalprice + 1000.0
                        ELSE o_totalprice END * 100) AS BIGINT) AS price_cents
       FROM orders ORDER BY o_orderkey"""
}
