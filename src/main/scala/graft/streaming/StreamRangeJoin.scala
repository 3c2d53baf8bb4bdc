package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2 #173 — CONTINUOUS co-occurrence pairing: the stream-stream
  * self-join form of [[graft.operators.Analytics.rangeJoinPairs]].
  * Two watermarked views of the live event stream inner-join on
  * user_id with a ± window time-range condition — the one Structured
  * Streaming join shape the layer didn't yet exercise (everything else
  * here is stateful flatMapGroups or stream-static).
  *
  * State story (the reason this form scales): with BOTH sides
  * watermarked and the join condition bounding b's event time to
  * a ± window, Spark derives a state watermark per side and EVICTS
  * buffered rows that can no longer match — join state is bounded by
  * (watermark + window) × arrival rate, not by stream length. Without
  * the time-range condition the same join would buffer both streams
  * forever. StreamingSpec proves the emitted pair set equals the
  * batch bucketized build on the same events.
  */
object StreamRangeJoin {

  /** Same-user event pairs within ± `windowSec`, ordered
    * a.event_id < b.event_id (each unordered pair once, as in the
    * batch twin). Append-mode: a pair emits once both sides have
    * arrived. */
  def pairs(events: DataFrame, windowSec: Int = 600,
            watermark: String = "1 hour"): DataFrame = {
    val a = events.select(col("user_id").as("a_user"),
      col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events.select(col("user_id").as("b_user"),
      col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b,
        col("a_user") === col("b_user") &&
          col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
          col("b_ts") <= col("a_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        abs(unix_micros(col("b_ts")) - unix_micros(col("a_ts")))
          .as("gap_us"))
  }
}
