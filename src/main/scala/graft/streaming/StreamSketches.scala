package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2 #216 — CONTINUOUS maintenance of the sketch-state artifact
  * ([[graft.operators.Sketches.sketchStatesToDir]]): each micro-batch's
  * per-source states are merged into the stored parquet — bottom-k
  * arrays by union-then-trim, HLL registers by elementwise max, HDR
  * cells by per-bucket count addition.
  *
  * Mergeability is the sketch doctrine's whole point, and this is its
  * streaming leg: all three state components are EXACTLY mergeable, so
  * after any prefix of batches the maintained artifact is bit-identical
  * to a batch rebuild over the same rows (StreamingSpec proves it — the
  * [[StreamPairs]] stance). A 100 TB profile run therefore never
  * re-scans the corpus to keep its profile current: the daily increment
  * updates KBs of state.
  *
  * Same single-writer stage→swap atomicity as [[StreamUpsert]]; the
  * composed sketch queries ([[Sketches.sourceJaccardComposed]] etc.)
  * read the maintained dir exactly as they read a batch-built one.
  */
object StreamSketches {

  /** Merge one micro-batch's sketch states into `stateDir`, keyed by
    * `batchId`. The bottom-k union and HLL register max are idempotent
    * merges, but HDR cell counts ADD — so a replayed batch
    * (foreachBatch's at-least-once contract) must be detected, not
    * re-merged. The applied batch id travels INSIDE the staged
    * artifact as an underscore-prefixed marker file (invisible to
    * parquet readers, like _SUCCESS), so the directory swap commits
    * state and marker atomically: a crash before the swap replays into
    * a merge (marker still old), a crash after it replays into a skip,
    * and a crash BETWEEN the swap's delete and rename replays into a
    * recovery ([[StreamIO.recoverInterruptedSwap]] — the staged dir
    * with its marker IS the committed state; without the recovery the
    * replay would rebuild from the replayed rows alone and silently
    * collapse the artifact). A marker AHEAD of the incoming batch id by
    * more than the single-replay case means the checkpoint was reset
    * against a live artifact — every batch would be skipped as "already
    * applied", silent data loss — so that fails loudly instead.
    * private[graft]: StreamingSpec drives it directly to prove replay
    * idempotence and the two crash paths. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                stateDir: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val staged = stateDir + ".staging"
    StreamIO.recoverInterruptedSwap(stateDir, staged, "_applied_batch", conf)
    val stored = StreamIO.readMarker(stateDir, "_applied_batch", conf)
    if (stored.exists(_ > batchId))
      throw new IllegalStateException(
        s"sketch-state artifact at $stateDir was built through batch " +
          s"${stored.get} but this query is at batch $batchId — the " +
          "checkpoint was reset against a live artifact; skipping " +
          "would silently drop every batch. Point the query at a " +
          "fresh stateDir or restore the original checkpoint.")
    if (stored.contains(batchId))
      return // replayed batch: the swapped artifact already has it
    val fresh = Sketches.sketchStatesOf(
      batch.select(col("source"), col("text")), k)
    val merged =
      if (StreamIO.hasParquetData(stateDir, conf))
        mergeStates(spark.read.parquet(stateDir), fresh, k)
      else fresh
    merged.write.mode("overwrite").parquet(staged)
    StreamIO.writeMarker(staged, "_applied_batch", batchId, conf)
    StreamIO.swapInto(staged, stateDir, conf)
  }

  /** EXACT merge of two per-source state tables: for every source the
    * result equals the state a single pass over the union of the two
    * inputs' rows would have produced —
    *  - `mk`: bottom-k of the union of distinct hashes = distinct ∪,
    *    sort, trim to k (both inputs are bottom-k of their own rows,
    *    and dropping values above the union's k-th loses nothing);
    *  - `regs`: elementwise max (the HLL merge law);
    *  - `cells`: per-bucket count addition (histogram counts add).
    * Sources present on one side only pass through via the outer join
    * + neutral-element coalesces (empty array / 64 zero registers). */
  private[streaming] def mergeStates(old: DataFrame, fresh: DataFrame,
                                     k: Int): DataFrame = {
    val emptyMk = expr("CAST(array() AS ARRAY<BIGINT>)")
    val zeroRegs = expr("CAST(array_repeat(0, 64) AS ARRAY<INT>)")
    val o = old.select(col("source"), col("mk").as("mk_o"),
      col("regs").as("regs_o"), col("cells").as("cells_o"))
    val n = fresh.select(col("source"), col("mk").as("mk_n"),
      col("regs").as("regs_n"), col("cells").as("cells_n"))
    o.join(n, Seq("source"), "full_outer")
      .select(col("source"),
        slice(array_sort(array_distinct(concat(
          coalesce(col("mk_o"), emptyMk),
          coalesce(col("mk_n"), emptyMk)))), 1, k).as("mk"),
        zip_with(coalesce(col("regs_o"), zeroRegs),
          coalesce(col("regs_n"), zeroRegs),
          (a, b) => greatest(a, b)).as("regs"),
        // per-bucket addition over the two sorted cell lists, done in
        // one expression (no re-shuffle): concatenate, group equal
        // buckets via aggregate over the bounded array
        sort_array(mergeCells(
          coalesce(col("cells_o"), emptyCells),
          coalesce(col("cells_n"), emptyCells))).as("cells"))
  }

  private val emptyCells =
    expr("CAST(array() AS ARRAY<STRUCT<b: BIGINT, cnt: BIGINT>>)")

  /** Sum counts per bucket across two cell arrays. The domain is
    * BOUNDED (≤ 16 cells/octave), so an array-level merge is O(cells²)
    * over ≤ a few hundred entries per source — no explode/shuffle. */
  private def mergeCells(a: org.apache.spark.sql.Column,
                         b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val both = concat(a, b)
    // distinct buckets, then for each bucket the summed count
    transform(array_distinct(transform(both, c => c.getField("b"))),
      bkt => struct(bkt.as("b"),
        aggregate(filter(both, c => c.getField("b") === bkt),
          lit(0L), (acc, c) => acc + c.getField("cnt")).as("cnt")))
  }

  /** Start the maintainer: `docs` needs (source, text); `stateDir`
    * holds the latest artifact after every micro-batch. */
  def start(docs: DataFrame, stateDir: String, checkpoint: String,
            k: Int = 256): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idle micro-batch: state already reflects every row seen
        if (!batch.isEmpty) applyBatch(batch, batchId, stateDir, k)
        ()
      }
      .start()
}
