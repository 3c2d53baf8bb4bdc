package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Filtering.cents

/** §2 #8 — dimension flattening: denormalize fact rows against the
  * dimension chain and aggregate revenue per region/nation.
  *
  * Reference semantics: Codeunit 60000 - Config. XML Exchange.al:119
  * `AddDimensionFields` + :894 `GetDimValueFromTable` look up dimension
  * values row-at-a-time while exporting. Spark-first re-expression: a
  * declarative star join, shaped for 100 TB —
  *
  *  - lineitem is pre-aggregated to one row per order BEFORE any join
  *    (map-side partial agg + one shuffle on l_orderkey), so the widest
  *    table crosses the network once, already reduced ~4×;
  *  - orders and customer scale with SF, so they are shuffle-joined
  *    (AQE picks shuffled-hash/sort-merge and coalesces partitions);
  *  - nation (25 rows) and region (5 rows) are bounded regardless of SF,
  *    so they are broadcast — the only safe broadcast in this chain.
  */
object DimFlatten {

  def dimFlatten(spark: SparkSession, sfDir: String): DataFrame = {
    val revByOrder = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"),
        (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("rev_c3"))
      .groupBy("l_orderkey")
      .agg(sum("rev_c3").as("rev_c3"), count(lit(1)).as("n_lines"))
    val orders = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey")
    val cust = Tables.load(spark, sfDir, "customer")
      .select("c_custkey", "c_nationkey")
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region")

    revByOrder
      .join(orders, revByOrder("l_orderkey") === orders("o_orderkey"))
      .join(cust, orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum("rev_c3").as("revenue_c3"), sum("n_lines").as("n_lines"))
      .orderBy("r_name", "n_name")
  }
}
