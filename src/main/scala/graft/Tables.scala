package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-checked loaders for the driver-provided testdata tables.
  *
  * All operators read through here so that a future swap to a real
  * lakehouse layout (partitioned dirs, catalog tables) is one change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val broadcastDims: Set[String] =
    Set("region", "nation", "customer", "supplier", "part")

  /** Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (see [[session]]): parquet TIMESTAMP(NANOS) columns (events.ts) arrive
    * as LongType nanos and are converted to microsecond timestamps here —
    * lossless for this data (driver generates whole-microsecond stamps),
    * and integral `div` avoids the >2^53 double-precision trap. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events"
        && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** The session settings every graft entrypoint (Verify/Bench/tests)
    * applies: UTC for oracle parity, nanos-tolerant parquet reads, AQE on. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // reliable-checkpoint files (clustersFromPairs' durable lineage
    // cuts) are deleted by the ContextCleaner once their RDD handle is
    // GC'd — without this, repeated propagation runs in one session
    // accumulate dead round checkpoints on disk forever
    .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
}
