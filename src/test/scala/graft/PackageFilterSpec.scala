package graft

import org.apache.spark.sql.functions._
import graft.operators.{MergeImport, PackageFilter}

class PackageFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(1, 5, 10, 50, 100).toDF("v")
  private def vals(f: String): Seq[Int] =
    df.filter(PackageFilter.compile(col("v"), f))
      .collect().map(_.getInt(0)).toSeq.sorted

  test("filter syntax: ranges, comparisons, alternation, negation") {
    assert(vals("5..50") == Seq(5, 10, 50))
    assert(vals("..10") == Seq(1, 5, 10))
    assert(vals("50..") == Seq(50, 100))
    assert(vals("<>10") == Seq(1, 5, 50, 100))
    assert(vals(">=50") == Seq(50, 100))
    assert(vals("<5") == Seq(1))
    assert(vals("1|100") == Seq(1, 100))
    assert(vals("..5|100..") == Seq(1, 5, 100))
  }

  test("package_filter: compiled predicates reach the parquet scan") {
    val plan = PackageFilter.packageFilter(spark, sf).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(o_totalprice,10000.0)"), plan)
    assert(plan.contains("Not(EqualTo(o_orderpriority,3-LOW))"), plan)
  }

  test("merge_upsert: updated keys win, untouched keys unchanged, no dup keys") {
    val out = MergeImport.mergeUpsert(spark, sf)
    assert(out.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0)
    assert(out.filter(col("o_orderkey") % 10 === 0)
      .filter(col("o_orderstatus") =!= "U").count() == 0)
    assert(out.count() == Tables.load(spark, sf, "orders").count())
  }
}
