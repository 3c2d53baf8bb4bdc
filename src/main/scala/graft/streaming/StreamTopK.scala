package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** §2 #178 — CONTINUOUS top-k heavy hitters: the custom mergeable
  * [[graft.functions.TopKFrequent]] aggregate running as a STREAMING
  * aggregation in complete output mode — the live "what's trending"
  * card over an event stream. Exercises the TypedImperativeAggregate
  * path through the state store (partial dictionaries per micro-batch,
  * binary-buffer merge into state), which no other streaming component
  * covered.
  *
  * Scale story: the exchange and the state store carry one bounded
  * top-k dictionary per partition/key, never the event stream;
  * complete-mode output is k rows. Exact at gate cardinality (the
  * batch twin's contract), so StreamingSpec proves the final batch
  * equals topk_frequent on the same events.
  */
object StreamTopK {

  /** Running top-k event types by count over the whole stream. */
  def topk(events: DataFrame, k: Int = 3): DataFrame =
    events
      .agg(graft.functions.TopKAggregate.topkFrequent(col("event_type"), k)
        .as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item").as("item"), col("t.cnt").as("cnt"))
}
