package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkSpec {

  test("fk_orphans: exactly the children of thinned parents, via anti join") {
    val r = Quality.fkOrphans(spark, sf).collect().head
    val expected = Tables.load(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 97 === 0).count()
    assert(r.getAs[Long]("n_orphan_lines") == expected)
    assert(r.getAs[Long]("n_orphan_keys") <= r.getAs[Long]("n_orphan_lines"))
    val plan = planOf(Quality.fkOrphans(spark, sf))
    assert(plan.contains("Anti"), plan)
  }

  test("deterministic_sample: stable membership, roughly pct-sized") {
    val a = Quality.deterministicSample(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    val b = Quality.deterministicSample(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(a == b, "sample must be identical across runs")
    val total = Tables.load(spark, sf, "orders").count()
    val frac = a.length.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"~10% expected, got $frac")
  }

  test("value_histogram: bins cover every row, bounds inside bins") {
    val rows = Quality.valueHistogram(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.load(spark, sf, "events").count())
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(r.getAs[Long]("min_c") >= bin * 2500
        && r.getAs[Long]("max_c") < (bin + 1) * 2500, r.toString)
    }
  }

  test("profile_table: one row per column, exact counts, pruned per-column legs") {
    val rows = Quality.profileTable(spark, sf).collect()
    assert(rows.length == 6)
    val n = Tables.load(spark, sf, "orders").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Long]("n_distinct") >= 1L)
    }
    val status = rows.find(_.getString(0) == "o_orderstatus").get
    assert(status.getAs[Long]("n_distinct") <= 3)
    // one leg per column, each scan PRUNED to its single column (total
    // I/O = the one-pass scan, without the 6x distinct-Expand blowup)
    val plan = planOf(Quality.profileTable(spark, sf))
      .split("== Initial Plan ==").head
    assert(plan.split("Scan parquet").length - 1 == 6, plan)
    assert(!plan.contains("Expand"), s"no distinct-expand:\n$plan")
    assert("ReadSchema: struct<o_orderkey:bigint>".r
      .findAllIn(plan).length == 1, plan)
  }

  test("profileApprox: HLL estimates within rsd bounds of the exact profile") {
    val exact = Quality.profile(Tables.load(spark, sf, "orders")).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = Quality.profileApprox(Tables.load(spark, sf, "orders"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, est) =>
      val e = exact(c).toDouble
      assert(math.abs(est - e) <= math.max(3, e * 0.15),
        s"$c: est $est vs exact $e")
    }
  }
}
