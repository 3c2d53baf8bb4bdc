package graft

import graft.operators.Filtering

class FilteringSpec extends SparkSpec {

  test("filter_pushdown: predicates reach the parquet scan") {
    val df = Filtering.filterPushdown(spark, sf)
    val scan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(scan.contains("PushedFilters:"), scan)
    assert(scan.contains("EqualTo(l_returnflag,R)"), scan)
    assert(scan.contains("GreaterThan(l_quantity,30.0)"), scan)
    assert(df.count() > 0)
  }

  test("projection: scan reads only the projected columns") {
    val df = Filtering.projection(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<p_partkey:bigint,p_brand:string,p_size:int>"), scan)
  }

  test("typed_format: every formatted value re-parses to the original") {
    val df = Filtering.typedFormat(spark, sf)
    assert(df.filter(!org.apache.spark.sql.functions.col("fmt_ok")).count() == 0)
  }

  test("column_mapping: renames are metadata-only (no shuffle)") {
    val df = Filtering.columnMapping(spark, sf)
    assert(df.columns.toSeq ==
      Seq("order_id", "customer_id", "status", "total_price", "priority"))
  }

  test("preview_sample: exactly n key-ordered rows") {
    val rows = Filtering.previewSample(spark, sf, 20).collect()
    assert(rows.length == 20)
    val keys = rows.map(_.getLong(0))
    assert(keys.sameElements(keys.sorted))
  }
}
