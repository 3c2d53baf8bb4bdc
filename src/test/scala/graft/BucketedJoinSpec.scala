package graft

import org.apache.spark.sql.functions._
import graft.sources.BucketedTables

class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val orders = Tables.load(spark, sf, "orders")
    val lineitem = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    BucketedTables.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    BucketedTables.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 8)

    // disable broadcast so the bucket-aware path is observable (at this
    // tiny SF the optimizer would rather broadcast; at 100 TB it can't)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedTables.bucketedJoin(
        spark, "lineitem_b", "orders_b", "l_orderkey", "o_orderkey")
      val plan = planOf(joined)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it computes the right thing
      assert(joined.count() == lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
