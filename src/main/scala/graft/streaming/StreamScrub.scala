package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** §2 #149c — CONTINUOUS ExactSubstr scrub: every arriving micro-batch
  * of documents is scrubbed (repeated spans cut, docs rebuilt,
  * fingerprinted — the batch #149b action) against the gram counts of
  * EVERYTHING SEEN SO FAR, including the batch itself. The corpus-wide
  * n-gram counts are the accumulated state, kept as an appendable
  * parquet artifact of per-batch partial counts (the same
  * build-once/serve-many doctrine as the verified-pair artifact —
  * docs/ARTIFACTS.md); a doc is scrubbed exactly as the batch operator
  * would scrub it over the prefix corpus at its arrival time
  * (StreamingSpec proves per-batch equality with that sequential
  * replay). Already-emitted docs are never retro-scrubbed — an
  * append-only output is the production contract of an ingest pipeline.
  *
  * Scale shape: per batch, ONE gram aggregate of the batch (appended as
  * partial counts), one re-aggregate of the bounded count table to the
  * ≥ minCount set (on a lakehouse this is a compacting MERGE —
  * docs/LAKEHOUSE.md; the append+reaggregate here is the same algebra
  * since counts are sums), and the map-only cut+rebuild of the batch.
  * Nothing ever re-pairs or re-reads the document history.
  */
object StreamScrub {

  private[streaming] def applyBatch(batch: DataFrame, countsDir: String,
                                    outDir: String, n: Int,
                                    minCount: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text"))
    // the batch's own grams join the accumulated counts FIRST, so
    // within-batch repetition scrubs exactly as the batch operator does
    Dedup.positionalGrams(b, n)
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .write.mode("append").parquet(countsDir)
    val repeated = spark.read.parquet(countsDir)
      .groupBy("g").agg(sum("cnt").as("cnt"))
      .filter(col("cnt") >= minCount).select("g")
    Dedup.scrubAgainstGrams(b, repeated, n)
      .write.mode("append").parquet(outDir)
  }

  /** Start the continuous scrub of `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, countsDir: String, outDir: String,
                  checkpoint: String, n: Int = 8,
                  minCount: Int = 2): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, countsDir, outDir, n, minCount)
      }
      .start()
}
