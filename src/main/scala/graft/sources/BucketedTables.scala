package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) table layout for co-located joins.
  *
  * At 100 TB the fact⋈fact join (lineitem⋈orders) dominates shuffle
  * traffic. Writing both sides bucketed by the join key means every
  * future join on that key is exchange-free: Spark reads bucket i of
  * both tables into the same task — the SortMergeJoin has no Exchange
  * beneath it (asserted in BucketedJoinSpec). This is the batch analog
  * of co-partitioned stream-stream joins.
  */
object BucketedTables {

  /** Write `df` as a bucketed managed table (warehouse dir is set by the
    * session; inside the build dir for tests). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a crashed previous run can leave the managed location behind with
    // no catalog entry; Spark refuses to reuse it (LOCATION_ALREADY_EXISTS)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    FsIO.delete(s"$warehouse/$table",
      spark.sparkContext.hadoopConfiguration)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Exchange-free equi-join of two tables bucketed on the same key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))
}
