package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2 #33 — Structured Streaming ingestion of the events table:
  * readStream → event-time watermark → tumbling-window aggregate.
  * Batch twin: graft.operators.Analytics.eventsWindow (same buckets,
  * same cents-exact sums), so batch backfill and streaming tail can be
  * unioned without reconciliation.
  */
object EventStream {

  /** File-source stream over the events parquet. The file source needs an
    * explicit schema, and the driver's generator has shipped ts as nanos
    * (→ BIGINT under nanosAsLong) and as µs TIMESTAMP across vintages —
    * so take the schema from a batch peek at the same file and normalize
    * ts exactly as Tables.load does for batch readers. */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val fileSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    graft.Tables.normalizeTs(
      spark.readStream
        .schema(fileSchema)
        // file source needs a directory; select just the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Streaming exact dedup: drop replayed/duplicate event ids, keeping
    * state only within the watermark horizon (bounded, unlike a plain
    * dropDuplicates whose state grows forever on a stream). */
  def dedupedStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** §2 #55 — stream-static enrichment join: the event stream joined to
    * a static dimension (customer → market segment), then windowed.
    * The static side is broadcast at every micro-batch's planning — the
    * streaming twin of the batch bounded-dim broadcast rule
    * (SURVEY §4); stream state stays bounded by the watermark exactly
    * as in [[hourlyAgg]]. */
  def enrichedBySegment(events: DataFrame, customers: DataFrame,
                        watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(customers.select(col("c_custkey"),
        col("c_mktsegment"))), col("user_id") === col("c_custkey"), "left")
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
        col("c_mktsegment"), col("n"), col("sum_value_c"))

  /** Watermarked tumbling-window aggregate. State is bounded: windows
    * older than watermark are finalized and dropped — the only shape
    * that survives an unbounded stream. */
  def hourlyAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
        col("event_type"), col("n"), col("sum_value_c"))

  /** §2 #195 — continuous SESSION windows via the NATIVE
    * `session_window` operator in a streaming aggregation — the state
    * store MERGES overlapping session fragments as events arrive (the
    * machinery [[Sessionizer]] hand-rolls with flatMapGroupsWithState,
    * here exercised through Spark's own operator; the batch face is
    * [[graft.operators.Sessionize.sessionizeNative]]). APPEND mode
    * only (Spark rejects update for merging session state): a session
    * emits exactly once, when the watermark passes its close — so
    * state is evicted at the same moment the result becomes final.
    * The spec drives the watermark past every real session with a
    * sentinel event and proves the emitted sessions equal the batch
    * operator row-for-row. */
  def sessionAgg(events: DataFrame, gapMinutes: Int = 30,
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"))
      .select(col("user_id"), col("n_events"), col("start_us"),
        col("duration_us"))

  /** §2 #186 — continuous HOPPING windows: the streaming face of
    * [[graft.operators.Analytics.eventsHopping]] (10-minute windows
    * every 5) — overlapping windows are the standard smoothed live
    * rate; the watermark bounds how long each open window's partial
    * aggregate stays in the state store (2 windows per event, so state
    * ≈ 2× the tumbling twin's, still bounded by the horizon). Spec
    * proves the complete-mode table equals the batch operator. */
  def hoppingAgg(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_c"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("sum_value_c"))
}
