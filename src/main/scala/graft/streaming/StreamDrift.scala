package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2 #191 — CONTINUOUS drift monitoring: the arriving stream's
  * event-type distribution against a STATIC reference count table,
  * re-published per micro-batch — the live face of
  * [[graft.operators.Analytics.driftReportFrom]] (which cuts one batch
  * in half; here the reference IS the frozen first half / last corpus
  * version and the stream is what arrives after it).
  *
  * Shape: a complete-mode streaming count per type (bounded state:
  * |types| rows) feeds foreachBatch, where the tiny counts table joins
  * the reference and the drift table is OVERWRITTEN — the serving-table
  * maintenance seam (a lakehouse run replaces the parquet overwrite
  * with a snapshot commit, docs/LAKEHOUSE.md). Chained aggregations
  * are illegal in a streaming query, so the share normalization lives
  * on the batch side of the seam by construction, not by preference.
  * StreamingSpec proves the published table equals the batch two-half
  * drift when the stream delivers exactly the second half.
  */
object StreamDrift {

  /** Shared arithmetic: reference (event_type, n_a) vs counts
    * (event_type, n_b) → the drift rows, 4-dp rounded exactly as the
    * batch operator. Types absent from one side count zero. */
  def driftOf(reference: DataFrame, counts: DataFrame): DataFrame = {
    val joined = reference.join(counts, Seq("event_type"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val totals = joined.agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
    // FAIL LOUDLY on an empty side: an empty reference table (or a
    // first micro-batch with zero counts) would otherwise publish null
    // shares/drift to the serving parquet, which a dashboard reads as
    // "no drift" — the silent-wrong outcome the repo's stance forbids.
    def share(n: String, t: String) =
      when(col(t) > 0, round(col(n) / col(t).cast("double"), 4))
        .otherwise(raise_error(concat(
          lit(s"drift monitor: total $t is zero/absent — refusing to "
            + "publish null shares"))))
    joined.crossJoin(broadcast(totals))
      .select(col("event_type"), col("n_a"), col("n_b"),
        share("n_a", "t_a").as("share_a"),
        share("n_b", "t_b").as("share_b"))
      .withColumn("drift", round(abs(col("share_a") - col("share_b")), 4))
      .orderBy("event_type")
  }

  /** Start the monitor: `events` needs an `event_type` column,
    * `reference` is the frozen (event_type, n_a) table, `outDir`
    * receives the latest drift table after every micro-batch. */
  def start(events: DataFrame, reference: DataFrame,
            outDir: String): StreamingQuery =
    events.groupBy("event_type").agg(count(lit(1)).as("n_b"))
      .writeStream.outputMode("complete")
      .foreachBatch { (counts: Dataset[Row], _: Long) =>
        // An idle interval (empty micro-batch, a normal transient) must
        // NOT kill the monitor: skip the overwrite and keep the last
        // published table. driftOf still raises loudly on an empty
        // REFERENCE — that one is misconfiguration, not idleness.
        if (!counts.isEmpty)
          driftOf(reference, counts.toDF())
            .write.mode("overwrite").parquet(outDir)
        ()
      }
      .start()
}
