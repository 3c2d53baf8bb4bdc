package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2 #213b — CONTINUOUS length-quantile card per source: the HDR
  * histogram of [[graft.operators.Sketches.hdrQuantilesFrom]] running
  * as a streaming aggregation — the live "what does each source's doc
  * length distribution look like so far" monitor over a document
  * stream.
  *
  * Shape: the stream aggregates `groupBy(source, hdrBucket).count()`
  * in complete mode — BOUNDED state (≤ 16 cells per octave per
  * source; an exact streaming quantile would keep every distinct
  * length) — and feeds foreachBatch, where the batch-side extraction
  * (cumulative rank over the bounded cell table, integer rank
  * targets) publishes the quantile card. Chained aggregations are
  * illegal in a streaming query, so the rank extraction lives on the
  * batch side of the seam by construction — same doctrine as
  * [[StreamDrift]].
  *
  * StreamingSpec proves the published table equals the batch twin's
  * estimate columns over the same rows: histogram counts add across
  * micro-batches, so the final complete-mode state is exactly the
  * batch histogram.
  */
object StreamQuantiles {

  /** The published card off a (source, b, cnt) cell table — shared
    * with the batch twin's estimate leg, column-for-column
    * (delegates to [[Sketches.hdrCardOf]], which the artifact-fed
    * composed form also ships). */
  def cardOf(cells: DataFrame): DataFrame = Sketches.hdrCardOf(cells)

  /** Start the monitor: `docs` needs (source, text); `outDir` receives
    * the latest per-source quantile card after every micro-batch. */
  def start(docs: DataFrame, outDir: String): StreamingQuery =
    docs
      .select(col("source"), length(col("text")).cast("long").as("v"))
      .select(col("source"), Sketches.hdrBucket.as("b"))
      .groupBy("source", "b").agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete")
      .foreachBatch { (cells: Dataset[Row], _: Long) =>
        // idle micro-batch: keep the last published card (StreamDrift
        // doctrine — idleness is not misconfiguration)
        if (!cells.isEmpty)
          cardOf(cells.toDF()).write.mode("overwrite").parquet(outDir)
        ()
      }
      .start()
}
