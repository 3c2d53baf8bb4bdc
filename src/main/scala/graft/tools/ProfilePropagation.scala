package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Measures scheduled Spark jobs/stages per DISTRIBUTED propagation
  * round (the >2M-edge path a 100 TB run always takes, VERDICT-r19 #5)
  * with the in-loop AQE-off window disabled (pre-r20 behaviour) vs
  * enabled — same synthetic chain graph, same JVM, A/B.
  *
  * The chain graph (id -> id+1) maximises rounds (O(log n) pointer
  * halving over one long component), so per-round cost dominates and
  * the jobs/round ratio is clean. Edge count is pushed past the 2M
  * driver fast-path bound so the distributed loop runs. */
object ProfilePropagation {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toLong).getOrElse(1100000L)
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    import java.util.concurrent.atomic.AtomicLong
    val jobs = new AtomicLong; val stages = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        }
      })

    // chain graph: n+1 nodes, n pairs -> 2n directed edges (> 2M bound)
    val pairs = spark.range(n).select(col("id").as("id_a"),
      (col("id") + 1).as("id_b"))
    val nodes = spark.range(n + 1).select(col("id").as("doc_id"))

    def run(label: String, aqeOff: Boolean): Unit = {
      Dedup.propagationAqeOff = aqeOff
      // warm page/codegen: one throwaway tiny run
      val j0 = jobs.get; val s0 = stages.get
      val t0 = System.nanoTime()
      val out = Dedup.dedupClustersFromPairs(nodes, pairs, maxIters = 40)
      val cnt = out.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val r = Dedup.lastPropagationRounds
      println(f"[pprof] $label%-18s rows=$cnt rounds=$r " +
        f"jobs=${jobs.get - j0} stages=${stages.get - s0} " +
        f"jobs/round=${(jobs.get - j0).toDouble / math.max(1, r)}%.1f " +
        f"wall=${dt}%.1fs")
      graft.operators.TransientCaches.release()
      spark.catalog.clearCache()
      System.gc()
    }
    run("aqe-on (pre-r20)", aqeOff = false)
    run("aqe-off (r20)", aqeOff = true)
    // repeat to control for warm-up order
    run("aqe-on (rep)", aqeOff = false)
    run("aqe-off (rep)", aqeOff = true)
    Dedup.propagationAqeOff = true
    spark.stop()
  }
}
