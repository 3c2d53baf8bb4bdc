package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofJoinNative

class AsofNativeSpec extends SparkSpec {

  test("native as-of join plans AsofJoinExec with sort-merge shape") {
    val df = AsofJoinNative.asofJoinNative(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("AsofJoin"), plan)
    // co-partition + sort both sides, like one sort-merge join
    assert(plan.contains("Sort ["), plan)
  }

  test("native as-of join equals the composed window implementation") {
    val native = AsofJoinNative.asofJoinNative(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Int])))
    val composed = graft.operators.AsofJoin.asofJoin(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Int])))
    assert(native.toSeq == composed.toSeq)
  }

  test("asof semantics: strictly earlier only, nulls for first event") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (3L, 1L, "r3"))
      .toDF("rk", "rt", "rtag")
    val out = AsofJoinNative.asofJoin(left, right, "k", "rk", "t", "rt")
      .select("k", "t", "tag", "rtag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(out == Set(
      (1L, 10L, "l1", None),          // rt=10 is NOT strictly earlier
      (1L, 20L, "l2", Some("r15")),   // latest rt < 20
      (2L, 5L, "l3", None)))          // no key-2 rows on the right
  }

  test("forward asof: first strictly-later right; later lefts still served") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 15L, "l2"), (1L, 30L, "l3"),
      (2L, 5L, "l4")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 20L, "r20"),
      (3L, 1L, "r3")).toDF("rk", "rt", "rtag")
    val out = AsofJoinNative.asofJoin(left, right, "k", "rk", "t", "rt",
      AsofJoinNative.Forward)
      .select("tag", "rtag").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(
      ("l1", Some("r15")), // rt=10 is not strictly later; 15 is first
      ("l2", Some("r20")), // the SAME r20 must also serve...
      ("l3", None),        // ...but nothing is later than 30
      ("l4", None)))       // no key-2 rows on the right
    // one right row can serve consecutive lefts (peek, not consume)
    val shared = AsofJoinNative.asofJoin(
      Seq((1L, 1L, "a"), (1L, 2L, "b")).toDF("k", "t", "tag"),
      Seq((1L, 9L, "r9")).toDF("rk", "rt", "rtag"),
      "k", "rk", "t", "rt", AsofJoinNative.Forward)
      .select("tag", "rtag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(shared == Set(("a", "r9"), ("b", "r9")))
  }

  test("asof nulls: null left key/time emits null-extended row; null right rows never match") {
    import spark.implicits._
    val left = Seq((Some(1L), Some(20L), "ok"), (None, Some(20L), "nullkey"),
      (Some(1L), None, "nulltime")).toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(10L), "r10"), (Some(1L), None, "rnull"),
      (None, Some(5L), "rnullkey")).toDF("rk", "rt", "rtag")
    val out = AsofJoinNative.asofJoin(left, right, "k", "rk", "t", "rt")
      .select("tag", "rtag").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(
      ("ok", Some("r10")),     // only the non-null right row matches
      ("nullkey", None),       // null key joins nothing, row survives
      ("nulltime", None)))     // null time joins nothing, row survives
  }
}
