package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, DimFlatten}

class AnalyticsSpec extends SparkSpec {

  test("q1_agg: grouped aggregation produces the 6 flag/status groups") {
    val rows = Analytics.q1Agg(spark, sf).collect()
    assert(rows.length == 6)
    // exact-cents invariant: sums are integers, avg derived from them
    val r = rows.head
    val sumQty = r.getAs[Long]("sum_qty_c")
    val cnt = r.getAs[Long]("count_order")
    assert(math.abs(r.getAs[Double]("avg_qty") -
      math.round(sumQty.toDouble / cnt / 100.0 * 10000) / 10000.0) < 1e-9)
  }

  test("window_rank: at most 3 rows per customer, rank ordered by price") {
    val df = Analytics.windowRank(spark, sf)
    val bad = df.groupBy("o_custkey").count().filter(col("count") > 3)
    assert(bad.count() == 0)
  }

  test("agg_skew_salted: salted two-stage equals plain groupBy") {
    val salted = Analytics.aggSkewSalted(spark, sf).collect()
    val plain = Tables.load(spark, sf, "events")
      .select(col("event_type"),
        graft.operators.Filtering.cents(col("value")).as("c"))
      .groupBy("event_type")
      .agg(sum("c").as("sum_value_c"), count(lit(1)).as("n_events"))
      .orderBy("event_type").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("events_window: buckets are whole hours") {
    val rows = Analytics.eventsWindow(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0).endsWith(":00:00")))
  }

  test("dim_flatten: bounded dims broadcast, no cartesian, fact pre-aggregated") {
    val df = DimFlatten.dimFlatten(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assertNoCartesian(df)
  }
}
