package graft.streaming

import graft.operators.Analytics
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2 #207b — CONTINUOUS CUSUM change-point monitor over the daily
  * event volume: the streaming twin of
  * [[graft.operators.Analytics.eventsCusum]] — the live "is ingest
  * volume drifting" card a training-data pipeline keeps on screen
  * (MAD fences flag single outlier days; CUSUM accumulates the small
  * persistent shift — the ingest-rot signature).
  *
  * Shape (the [[StreamQuantiles]] doctrine): the stream aggregates
  * `groupBy(day).count()` in complete mode — BOUNDED state, one row
  * per distinct day ever seen — and feeds foreachBatch, where the
  * CUSUM finishing (exact-integer μ/σ + the prefix-sum closed form
  * over the bounded day table) publishes the card. Chained
  * aggregations are illegal in a streaming query, and CUSUM's μ/σ and
  * prefix minima are GLOBAL over the day table, so the finishing lives
  * on the batch side of the seam by construction.
  *
  * StreamingSpec proves the published table equals the batch twin:
  * day counts ADD across micro-batches, so the final complete-mode
  * state IS the batch day table, and the shared
  * [[Analytics.eventsCusumFromCounts]] finishing makes the card equal
  * bit-for-bit.
  */
object StreamCusum {

  /** The published card off a (day, n) table — the batch twin's own
    * finishing, shared column-for-column. */
  def cardOf(dayCounts: DataFrame): DataFrame =
    Analytics.eventsCusumFromCounts(dayCounts)

  /** Start the monitor: `events` needs a ts column; `outDir` receives
    * the latest change-point card after every micro-batch. */
  def start(events: DataFrame, outDir: String): StreamingQuery =
    events
      .select(expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .foreachBatch { (dayCounts: Dataset[Row], _: Long) =>
        // idle micro-batch: keep the last published card (StreamDrift
        // doctrine — idleness is not misconfiguration)
        if (!dayCounts.isEmpty)
          cardOf(dayCounts.toDF()).write.mode("overwrite").parquet(outDir)
        ()
      }
      .start()
}
