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

  test("q5_region_revenue: line counts reconcile; dims broadcast, facts shuffle") {
    val q5 = Analytics.q5RegionRevenue(spark, sf)
    val rows = q5.collect()
    // every lineitem whose order has a customer contributes exactly once
    val totalLines = rows.map(_.getAs[Long]("n_lines")).sum
    val expect = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .count()
    assert(totalLines == expect)
    assert(rows.forall(_.getAs[Long]("revenue_c3") > 0))
    // the plan story IS the point: three broadcast dimension legs, and
    // the fact⋈fact join is NOT a broadcast
    val p = planOf(q5)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || expect < 100000, "fact join should shuffle at scale")
  }

  test("basket_lift: counts bounded, lift recomputes from the counts") {
    val rows = Analytics.basketLift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.length == 20)
    val nOrders = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey").distinct().count()
    rows.foreach { case (p1, p2, both, na, nb, lift) =>
      assert(p1 < p2)
      assert(both <= math.min(na, nb))
      val want = java.math.BigDecimal.valueOf(both.toDouble * nOrders / (na * nb))
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(lift == want, s"($p1,$p2): $lift vs $want")
    }
    // descending support with the documented tie-break
    val key = rows.map { case (p1, p2, both, _, _, _) => (-both, p1, p2) }
    assert(key.sortBy(identity).toSeq == key.toSeq)
  }

  test("gate_agreement: contingency sums to n, kappa replays from counts") {
    val r = graft.operators.TextAnalysis.gateAgreement(spark, sf)
      .collect().head
    val (n, n11, n10, n01, n00) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n == n11 + n10 + n01 + n00 && n > 0)
    val po = (n11 + n00).toDouble / n
    val pa = (n11 + n10).toDouble / n
    val pb = (n11 + n01).toDouble / n
    val pe = pa * pb + (1.0 - pa) * (1.0 - pb)
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(r.getDouble(5) == r4(po))
    assert(r.getDouble(6) == r4(pe))
    if (1.0 - pe != 0.0)
      assert(r.getDouble(7) == r4((po - pe) / (1.0 - pe)))
    assert(r.getDouble(7) <= 1.0)
  }

  test("events_hopping: every event lands in exactly two windows") {
    val hop = Analytics.eventsHopping(spark, sf).collect()
    val totalN = hop.map(_.getAs[Long]("n")).sum
    val totalC = hop.map(_.getAs[Long]("sum_value_c")).sum
    val ev = Tables.load(spark, sf, "events")
      .agg(count(lit(1)),
        sum(graft.operators.Filtering.cents(col("value")))).collect().head
    assert(totalN == 2 * ev.getLong(0), s"$totalN vs 2*${ev.getLong(0)}")
    assert(totalC == 2 * ev.getLong(1))
    // window starts are 5-minute aligned and each covers 10 minutes
    assert(hop.forall { r =>
      val m = r.getAs[String]("win_start").substring(14, 16).toInt
      m % 5 == 0
    })
  }

  test("sessionize_native: inclusive boundary, row-equal to the custom islands") {
    import spark.implicits._
    import graft.operators.Sessionize
    // native gap boundary is INCLUSIVE: 1800s exactly still merges
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val ev = Seq((1L, 1L, at(0)), (1L, 2L, at(1800)), (1L, 3L, at(1801)),
      (2L, 4L, at(0)), (2L, 5L, at(3601)))
      .toDF("user_id", "event_id", "ts")
    val native = ev
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // user 1: boundary event merges, the 1801s one chains → one session
    assert(native(1L) == Seq(3L), native)
    // user 2: 3601s gap breaks → two sessions of 1
    assert(native(2L) == Seq(1L, 1L), native)
    // both formulations must agree row-for-row on the fixture corpus
    val custom = Sessionize.sessionize(spark, sf).collect().map(_.toSeq).toSeq
    val nat = Sessionize.sessionizeNative(spark, sf).collect()
      .map(_.toSeq).toSeq
    assert(nat == custom, s"sizes native=${nat.size} custom=${custom.size}")
  }

  test("events_ewma: sequential fold replayed, partition-invariant") {
    import spark.implicits._
    val ev = Seq(
      (7L, 1L, 100L, 200L), (7L, 2L, 200L, 400L), (7L, 3L, 300L, 100L),
      (8L, 4L, 100L, 300L)
    ).toDF("user_id", "event_id", "t", "v_c")
    val got = Analytics.eventsEwmaFrom(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 7: 2.0 → .5·4+.5·2 = 3.0 → .5·1+.5·3 = 2.0; user 8: 3.0
    assert(got(7L) == ((3L, 2.0)) && got(8L) == ((1L, 3.0)), got)
    val re = Analytics.eventsEwmaFrom(ev.repartition(5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(re == got)
  }

  test("join_skew_salted: equals the plain join, exchange keys carry the salt") {
    val salted = Analytics.joinSkewSalted(spark, sf)
    val got = salted.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum(graft.operators.Filtering.cents(col("l_extendedprice")))
        .as("revenue_c"), count(lit(1)).as("n_lines"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == plain)
    // the join must be a shuffle join whose key includes the salt —
    // i.e. no broadcast of the replicated side
    val p = planOf(salted)
    assert(p.contains("SortMergeJoin") && p.contains("salt"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("pivot_status: wide cells re-sum to the per-priority totals") {
    val wide = Analytics.pivotStatus(spark, sf).collect()
      .map(r => r.getString(0) ->
        Seq(1, 2, 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum)
      .toMap
    val long = Tables.load(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(sum(graft.operators.Filtering.cents(col("o_totalprice"))).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == long)
  }

  test("rollup_agg: one pass yields grand total, per-status, and leaf levels") {
    val rows = Analytics.rollupAgg(spark, sf).collect()
    val byGid = rows.groupBy(_.getAs[Int]("gid"))
    val grand = byGid(3).head
    assert(byGid(3).length == 1 && grand.isNullAt(0) && grand.isNullAt(1))
    assert(grand.getAs[Long]("n") ==
      Tables.load(spark, sf, "orders").count())
    // leaf sums roll up exactly to the status level and the grand total
    val leafSum = byGid(0).map(_.getAs[Long]("sum_price_c")).sum
    val statusSum = byGid(1).map(_.getAs[Long]("sum_price_c")).sum
    assert(leafSum == statusSum && statusSum == grand.getAs[Long]("sum_price_c"))
  }

  test("pctile_value: discrete percentiles are real values and monotone") {
    val rows = Analytics.pctileValue(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(p50 <= p90 && p90 <= p99, s"monotone: $r")
    }
    // discrete percentile = an actual data value, not an interpolation
    val vals = Tables.load(spark, sf, "events")
      .select(graft.operators.Filtering.cents(col("value")).as("v"))
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => vals.contains(r.getLong(1))))
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

  test("rolling_window: trailing range frame counts exactly the in-window events") {
    val rows = graft.operators.Analytics.rollingWindow(spark, sf).collect()
    assert(rows.length > 0)
    // every row counts at least itself; the frame never exceeds the
    // user's total event count
    val byUser = rows.groupBy(_.getLong(0))
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 1 && n <= byUser(r.getLong(0)).length)
    }
    // brute-force replay on one user
    val u = rows.head.getLong(0)
    val ev = Tables.load(spark, sf, "events")
      .filter(col("user_id") === u)
      .selectExpr("event_id", "unix_micros(ts) AS t").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = byUser(u).map(r => (r.getLong(1), r.getLong(2))).toMap
    ev.foreach { case (eid, t) =>
      val expect = ev.count { case (_, t2) =>
        t2 <= t && t2 >= t - 3600L * 1000000L }
      assert(got(eid) == expect.toLong, s"event $eid")
    }
  }

  test("funnel_steps: strictly-ordered steps, monotone user counts") {
    import spark.implicits._
    // u1 completes the funnel; u2 clicks BEFORE viewing (no conversion);
    // u3 views only; u4 re-views after clicking (first view counts)
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 100L), (2L, "view", 200L),
      (3L, "view", 50L),
      (4L, "view", 10L), (4L, "click", 20L), (4L, "view", 5L)
    ).toDF("user_id", "event_type", "t")
    val got = graft.operators.Analytics
      .funnelStepsFrom(ev, Seq("view", "click", "purchase")).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1) == ((4L, 0.0)))
    // u4's first view is t=5, click at 20 counts (gap 15us); u2 does not
    assert(got(2)._1 == 2L)
    assert(got(3) == ((1L, (300L - 200L) / 1e6)))
    // strictly-after: a click AT the view instant must not convert
    val tie = Seq((9L, "view", 100L), (9L, "click", 100L))
      .toDF("user_id", "event_type", "t")
    val g2 = graft.operators.Analytics
      .funnelStepsFrom(tie, Seq("view", "click", "purchase")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(g2(2) == 0L && g2(3) == 0L)
  }

  test("range_join: banded equi-join equals the naive theta join, no cartesian") {
    val w = 600 * 1000000L
    val got = Analytics.rangeJoinPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // naive reference: per-user all-pairs on the tiny SF
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val expect = ev.toSeq.flatMap { case (u, es) =>
      val pairs = for {
        a <- es; b <- es
        if a._2 < b._2 && math.abs(a._3 - b._3) <= w
      } yield math.abs(a._3 - b._3)
      if (pairs.isEmpty) None
      else Some((u, pairs.length.toLong, pairs.min, pairs.max))
    }.sortBy(_._1)
    assert(got.toSeq == expect)
    // the banding must keep the plan an equi-join
    assertNoCartesian(Analytics.rangeJoinPairs(spark, sf))
  }

  test("retention_cohorts: triangle matches a hand-rolled reference; offset 0 = cohort size") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val first = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = ev.map { case (u, wk) =>
      val c = first(u)
      ((c, java.time.temporal.ChronoUnit.DAYS.between(c, wk).toInt / 7), u)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = Analytics.retentionCohorts(spark, sf).collect()
      .map(r => ((r.getDate(0).toLocalDate, r.getInt(1)), r.getLong(2))).toMap
    assert(got == expect)
    // every user appears in their cohort at offset 0
    val cohortSizes = first.toSeq.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    cohortSizes.foreach { case (wk, n) => assert(got((wk, 0)) == n) }
  }

  test("scd2_intervals: versions collapse runs, intervals tile the history, one sort") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val got = graft.operators.MergeImport.scd2Intervals(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5)))
    got.groupBy(_._1).foreach { case (u, rows) =>
      val hist = ev.filter(_._1 == u).sortBy(e => (e._3, e._2))
      // reference run-length collapse
      val expect = hist.foldLeft(Vector.empty[(String, Long)]) {
        case (acc, (_, _, t, s)) =>
          if (acc.nonEmpty && acc.last._1 == s) acc else acc :+ (s, t)
      }
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to expect.length), s"user $u versions")
      assert(sorted.map(r => (r._3, r._4)).toSeq == expect, s"user $u runs")
      // intervals tile: valid_to = next valid_from; only the last is open
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._5.contains(b._4) && !a._6)
        case _ => ()
      }
      assert(sorted.last._5.isEmpty && sorted.last._6)
    }
    // both windows share one partitioning+order: exactly one Sort below
    // AQE's toString repeats the plan under "== Initial Plan ==" —
    // audit only the final section
    val plan = planOf(graft.operators.MergeImport.scd2Intervals(spark, sf))
      .split("== Initial Plan ==").head
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"one keyed exchange expected:\n$plan")
  }

  test("drift_report: planted distribution shift is measured exactly") {
    import spark.implicits._
    // half A (t<50): 3 x, 1 y; half B (t>=50): 1 x, 3 y
    val ev = Seq(("x", 0L), ("x", 10L), ("x", 20L), ("y", 30L),
      ("x", 60L), ("y", 70L), ("y", 80L), ("y", 100L))
      .toDF("event_type", "t")
    val got = graft.operators.Analytics.driftReportFrom(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == Seq(
      ("x", 3L, 1L, 0.75, 0.25, 0.5),
      ("y", 1L, 3L, 0.25, 0.75, 0.5)))
  }

  test("funnel_windowed: only in-window conversions count; delay is exact") {
    import spark.implicits._
    // u1: A at 0, B at 30m (in window) and 90m; u2: A at 0, B at 2h
    // (out of window); u3: B before A only -> not converted
    val h = 3600000000L
    val ev = Seq(
      (1L, "view", 0L), (1L, "purchase", h / 2), (1L, "purchase", h + h / 2),
      (2L, "view", 0L), (2L, "purchase", 2 * h),
      (3L, "purchase", 0L), (3L, "view", h))
      .toDF("user_id", "event_type", "t")
    val r = graft.operators.Analytics
      .funnelWindowedFrom(ev, "view", "purchase", h).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 0.3333)
    assert(r.getDouble(3) == (h / 2) / 1e6) // u1's 30-minute delay
  }

  test("event_dedup: exactly the within-window identity repeats, gaps exact") {
    val base = Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        math.round(r.getDouble(4) * 100)))
    // the operator's deterministic replayed slice
    val ev = base ++ base.filter(_._1 % 101 == 0)
      .map(e => (-(e._1 + 1L), e._2, e._3, e._4 + 1000000L, e._5))
    assert(ev.length > base.length, "replay slice must be non-empty")
    val expect = ev.groupBy(e => (e._2, e._3, e._5)).values.flatMap { g =>
      val sorted = g.sortBy(e => (e._4, e._1)).toSeq
      sorted.zip(sorted.tail).collect {
        case (a, b) if b._4 - a._4 <= 600000000L =>
          (b._1, b._2, b._3, b._4 - a._4)
      }
    }.toSeq.sortBy(_._1)
    val got = Analytics.eventDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == expect)
  }

  test("attribution: last in-window touch wins; tie breaks on event_id") {
    import spark.implicits._
    val m = 60000000L // one minute in micros
    // (event_id, user_id, type, t, value_cents)
    val ev = Seq(
      // u1: view@1m, click@5m, purchase@10m -> click (later touch)
      (1L, 1L, "view", 1 * m, 0L), (2L, 1L, "click", 5 * m, 0L),
      (3L, 1L, "purchase", 10 * m, 500L),
      // u2: only touch is AFTER the purchase -> none
      (4L, 2L, "purchase", 10 * m, 700L), (5L, 2L, "view", 20 * m, 0L),
      // u3: two touches at the SAME instant -> larger event_id (click)
      (6L, 3L, "view", 2 * m, 0L), (7L, 3L, "click", 2 * m, 0L),
      (8L, 3L, "purchase", 3 * m, 900L),
      // u4: touch outside the 30m window -> none
      (9L, 4L, "view", 0L, 0L), (10L, 4L, "purchase", 40 * m, 1100L))
      .toDF("event_id", "user_id", "event_type", "t", "v_c")
    val got = Analytics
      .attributionFrom(ev, Seq("view", "click"), 30 * m).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("click", 2L, 1400L, 2L),   // u1 (500) + u3 (900)
      ("none", 2L, 1800L, 2L)))   // u2 (700) + u4 (1100)
    // "last" must be the argmax aggregate, not a window over the stream
    val plan = planOf(Analytics.attribution(spark, sf))
    assert(!plan.contains("Window"), "no window over the event stream")
    assert(!plan.contains("Cartesian"), "per-user equi-join only")
  }

  test("path_transitions: per-user lag pairs with conditional shares") {
    import spark.implicits._
    // u1: a->b->a ; u2: a->b ; first events produce no transition.
    // from 'a': 2×(a->b); from 'b': 1×(b->a)
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 10L, 4L), (2L, "b", 20L, 5L))
      .toDF("user_id", "event_type", "t", "event_id")
    val got = graft.operators.Analytics.pathTransitionsFrom(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("a", "b", 2L, 1.0), ("b", "a", 1L, 1.0)))
    // same-timestamp ties order by event_id: b(t=20,id=5) after a(id=4)
    val tie = Seq((3L, "x", 10L, 7L), (3L, "y", 10L, 6L))
      .toDF("user_id", "event_type", "t", "event_id")
    val gotTie = graft.operators.Analytics.pathTransitionsFrom(tie)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(gotTie == Seq(("y", "x")))
    // the single window pass is user-partitioned, never a global sort
    val plan = planOf(graft.operators.Analytics.pathTransitions(spark, sf))
    assert(plan.contains("Window"), "lag runs as a window")
    assert(plan.contains("windowspecdefinition(user_id"),
      "window must partition by user")
  }

  test("events_anomaly: hand-built spike flagged; median/MAD exact") {
    import spark.implicits._
    // 7 quiet days of 10 events + one day of 100: med=10, MAD=0 on the
    // quiet fixture would null scores, so stagger counts 8..14
    val days = (0L to 6L).flatMap(d => Seq.fill(8 + d.toInt)(d)) ++
      Seq.fill(100)(7L)
    val got = graft.operators.Analytics
      .eventsAnomalyFrom(days.toDF("day"), 3.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    // counts 8,9,10,11,12,13,14,100: med = 11.5, adevs
    // 3.5,2.5,1.5,.5,.5,1.5,2.5,88.5 -> mad = 2.0
    assert(got.forall(r => r._3 == 11.5 && r._4 == 2.0))
    val flagged = got.filter(_._6).map(_._1)
    assert(flagged.toSeq == Seq(7L), s"flagged=$flagged")
    assert(got.find(_._1 == 7L).get._5 == 44.25)   // 88.5 / 2.0
  }

  test("events_cusum: closed form equals the sequential fold; drift caught") {
    import spark.implicits._
    // 20 days at ~100 (alternating 98/102), then 15 days at 92 — an 8%
    // sustained drop. No single day is an outlier (the MAD fence of
    // events_anomaly stays quiet on the shifted days' 92s), but the
    // CUSUM walk accumulates the shift past 4 sigma.
    val series = (0 until 20).map(d =>
      (d.toLong, if (d % 2 == 0) 98 else 102)) ++
      (20 until 35).map(d => (d.toLong, 92))
    val days = series.flatMap { case (d, n) => Seq.fill(n)(d) }
    val got = graft.operators.Analytics
      .eventsCusumFrom(days.toDF("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6)))
    // sequential reference fold of the textbook recurrence
    val ns = series.map(_._2.toDouble)
    val mu = ns.sum / ns.length
    val sigma = math.sqrt(ns.map(x => x * x).sum / ns.length - mu * mu)
    var sPos = 0.0; var sNeg = 0.0
    val ref = ns.map { n =>
      sPos = math.max(0.0, sPos + (n - mu - sigma / 2))
      sNeg = math.max(0.0, sNeg + (mu - sigma / 2 - n))
      (sPos, sNeg)
    }
    got.zip(ref).foreach { case ((d, _, sp4, sn4, _), (rp, rn)) =>
      assert(math.abs(sp4 - rp) < 1e-3, s"day $d s_pos $sp4 vs $rp")
      assert(math.abs(sn4 - rn) < 1e-3, s"day $d s_neg $sn4 vs $rn")
    }
    // the drift is caught: the DOWNWARD walk crosses 4 sigma inside the
    // shifted regime (the upward side also flags late pre-shift days —
    // correct for a full-series baseline, which the mean-shift pulls
    // down, putting the 98/102 regime above mu)
    val sigma4 = sigma * 4
    assert(got.exists(r => r._1 >= 20L && r._4 > sigma4),
      s"downward CUSUM never crossed ${sigma4}")
    // no shifted day trips the 3-MAD single-day fence — the CUSUM
    // catches what the anomaly fence structurally cannot
    val fence = graft.operators.Analytics
      .eventsAnomalyFrom(days.toDF("day"), 3.0).collect()
      .filter(_.getBoolean(5)).map(_.getLong(0))
    assert(fence.intersect((20L until 35L).toSeq).isEmpty,
      s"MAD fence unexpectedly flagged shifted days: ${fence.toSeq}")
  }
}
