package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev profiler: run named headline queries (args) in one JVM and print
  * wall seconds, Spark job count, stage count, task count and summed
  * task time per query — the stage-overhead discriminator the
  * optimization rounds use to tell fixed scheduling cost from data
  * cost. Not part of the bench contract. */
object ProfileQueries {
  private final class Counter extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.AtomicLong
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong; val taskMs = new AtomicLong
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(
        s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    }
    def snap: (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskMs.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "embeddings")
      .selectExpr("sum(size(embedding))").collect()
    val c = new Counter
    spark.sparkContext.addSparkListener(c)
    val reps = sys.env.getOrElse("PROFILE_REPS", "2").toInt
    args.foreach { name =>
      (1 to reps).foreach { rep =>
        val pre = c.snap
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        // drain listener bus before snapshotting
        graft.operators.TransientCaches.release()
        spark.catalog.clearCache()
        Thread.sleep(300)
        val post = c.snap
        println(f"[profile] $name%-28s rep$rep ${t}%7.2fs jobs=${
          post._1 - pre._1}%4d stages=${post._2 - pre._2}%5d tasks=${
          post._3 - pre._3}%6d taskTime=${(post._4 - pre._4) / 1000.0}%8.1fs")
        System.gc()
      }
    }
    spark.stop()
  }
}
