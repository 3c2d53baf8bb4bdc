package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-scoped registry for caches an operator creates as part of
  * its own plan (prefix tables, propagation edges, survivor sets).
  *
  * The tension it resolves: several operators persist an intermediate
  * that BOTH join legs of their plan consume, and the returned frame
  * is lazy — so the operator itself has no safe point to unpersist
  * (before the caller's action the cache is still needed; after it the
  * operator is long out of scope). Eagerly materializing the result
  * instead is measurably worse: the candidate sets these operators
  * produce run to millions of rows, and pinning them breaks the
  * pipelined fusion into the verify/aggregate stages (measured +50%
  * on the corpus-dedup pipeline at sf0.1).
  *
  * So operators REGISTER what they persist, and the session boundary
  * frees it: call [[release]] after materializing a pipeline's result
  * (Bench and Verify do, between queries). Repeated calls of the same
  * operator before a release simply re-register — the registry is
  * bounded by one entry per operator call, each a cache the caller's
  * own plans may still be reusing (CacheManager substitutes matching
  * subplans, so a re-run of the SAME operator before release is a
  * cache hit, not a second copy).
  *
  * On a multi-tenant cluster the equivalent boundary is job teardown;
  * nothing here is load-bearing for correctness — dropping a cache
  * early only costs recompute.
  */
object TransientCaches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Register a frame persisted inside an operator; returns it. */
  def register(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist every registered cache (non-blocking) and clear the
    * registry. Safe to call at any time — at worst a still-needed
    * cache is recomputed by its consumer's next action. */
  def release(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }
}
