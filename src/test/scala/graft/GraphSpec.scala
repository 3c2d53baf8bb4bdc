package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {

  test("pagerank: cycle is uniform, star concentrates, mass conserved") {
    import spark.implicits._
    // 3-cycle: perfectly symmetric, every iteration keeps pr = 1/3
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val cy = Graph.pageRankFrom(cycle).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cy.values.forall(p => math.abs(p - 1.0 / 3) < 1e-9), cy)

    // star: every leaf links to the hub; hub links back to one leaf
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (9L, 1L))
      .toDF("src", "dst")
    val st = Graph.pageRankFrom(star).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(st(9L) > st(1L) && st(1L) > st(2L), st)
    assert(st(2L) == st(3L) && st(3L) == st(4L), st)
    // total mass stays ~1 (teleport + damped contributions)
    assert(math.abs(st.values.sum - 1.0) < 1e-6, st.values.sum)
  }

  test("pagerank: one iteration equals the hand formula, partition-invariant") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRankFrom(edges, d = 0.85, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent driver-side replay: pr0 = 1/3; deg = (1→2, 2→1, 3→1).
    // Spark's round(col, s) is BigDecimal.valueOf + HALF_UP — replayed
    // exactly here.
    def rnd(x: Double, s: Int): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x)
        .setScale(s, java.math.RoundingMode.HALF_UP)
    val pr0 = 1.0 / 3
    def step(in: Map[Long, Double]): Map[Long, Double] = {
      val deg = Map(1L -> 2, 2L -> 1, 3L -> 1)
      val contribs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
        .map { case (s, t) =>
          t -> rnd(rnd(in(s), 10).doubleValue() / deg(s), 12) }
      Seq(1L, 2L, 3L).map { v =>
        val sc = contribs.filter(_._1 == v).map(_._2)
          .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
        v -> rnd((1.0 - 0.85) / 3.0 + 0.85 * sc.doubleValue(), 10)
          .doubleValue()
      }.toMap
    }
    val want = step(Map(1L -> pr0, 2L -> pr0, 3L -> pr0))
    assert(got == want, s"$got vs $want")

    val re = Graph.pageRankFrom(edges.repartition(5), d = 0.85, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(re == got)
  }
}
