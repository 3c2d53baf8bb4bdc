package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** §2 #149c — CONTINUOUS ExactSubstr scrub: every arriving micro-batch
  * of documents is scrubbed (repeated spans cut, docs rebuilt,
  * fingerprinted — the batch #149b action) against the gram counts of
  * EVERYTHING SEEN SO FAR, including the batch itself. The corpus-wide
  * n-gram counts are the accumulated state, kept as a parquet artifact
  * of per-batch partial counts (the same build-once/serve-many doctrine
  * as the verified-pair artifact — docs/ARTIFACTS.md); a doc is
  * scrubbed exactly as the batch operator would scrub it over the
  * prefix corpus at its arrival time (StreamingSpec proves per-batch
  * equality with that sequential replay). Already-emitted docs are
  * never retro-scrubbed — an append-only output is the production
  * contract of an ingest pipeline.
  *
  * EXACTLY-ONCE under foreachBatch's at-least-once replay (the
  * StreamPairs discipline): both writes land in `batch_id=N`
  * subdirectories with mode(overwrite), so a replayed batch overwrites
  * its own partitions instead of double-counting its grams — a plain
  * parquet append would let a crash between the two writes inflate a
  * unique gram to cnt ≥ minCount and silently scrub legitimate text in
  * every later batch. The counts this batch scrubs against therefore
  * read the accumulated artifact EXCLUDING batch_id=N, plus this
  * batch's freshly-computed own counts.
  *
  * Scale shape: per batch, ONE gram aggregate of the batch, one
  * re-aggregate of the bounded count table to the ≥ minCount set (on a
  * lakehouse: a compacting MERGE — docs/LAKEHOUSE.md; same algebra,
  * counts are sums), and the map-only cut+rebuild of the batch. The
  * document history is never re-read.
  */
object StreamScrub {

  /** Apply one micro-batch idempotently (keyed by `batchId`).
    * private[graft]: StreamingSpec drives it directly to prove replay
    * idempotence. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                countsDir: String, outDir: String,
                                n: Int, minCount: Int): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col("doc_id"), col("text"))
    val own = Dedup.positionalGrams(b, n)
      .groupBy("g").agg(count(lit(1)).as("cnt"))
    own.write.mode("overwrite").parquet(s"$countsDir/batch_id=$batchId")
    // history counts EXCLUDE this batch id (a replay must not see its
    // own half-applied write as history) — own counts join explicitly
    val history = StreamPairs.readAccumulated(spark, countsDir)
      .map(_.filter(col("batch_id") =!= batchId).select("g", "cnt"))
      .getOrElse(own.filter(lit(false)).select("g", "cnt"))
    val repeated = history.unionAll(own.select("g", "cnt"))
      .groupBy("g").agg(sum("cnt").as("cnt"))
      .filter(col("cnt") >= minCount).select("g")
    Dedup.scrubAgainstGrams(b, repeated, n)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
  }

  /** Start the continuous scrub of `docs` (needs doc_id, text). */
  def applyStream(docs: DataFrame, countsDir: String, outDir: String,
                  checkpoint: String, n: Int = 8,
                  minCount: Int = 2): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, countsDir, outDir, n, minCount)
      }
      .start()
}
