package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev profiler for the dedup prefix-join family's sub-phases. */
object ProfileDedup {
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
    Tables.load(spark, sfDir, "documents")
      .selectExpr("sum(length(text))").collect()
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[dprof] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    (1 to 2).foreach { rep =>
      t(s"rep$rep ngram_exactjoin.count") {
        Dedup.dedupNgramExactjoin(spark, sfDir, 0.3).count()
      }
      graft.operators.TransientCaches.release(); spark.catalog.clearCache()
      t(s"rep$rep pairs.persist.count") {
        val p = Dedup.dedupNgramExactjoin(spark, sfDir, 0.3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        t(s"rep$rep   clustersFromPairs(warm pairs)") {
          Dedup.dedupClustersFromPairs(
            Tables.load(spark, sfDir, "documents").select(col("doc_id")),
            p).count()
          println(s"[dprof] rounds=${Dedup.lastPropagationRounds}")
        }
        p.unpersist()
      }
      graft.operators.TransientCaches.release(); spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
