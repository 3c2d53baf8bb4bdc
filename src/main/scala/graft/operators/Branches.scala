package graft.operators

import org.apache.spark.sql.DataFrame

/** Concurrent evaluation of INDEPENDENT branch frames (guide §2.6:
  * Spark happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them
  * sequentially).
  *
  * The sweep/eval query family unions N independent small aggregates
  * (one row per swept setting). As ONE action, AQE executes the union's
  * sub-stages as a long chain of sequential single-task stage-jobs —
  * mostly idle cores at any parallelism (measured ~90 stage-jobs on
  * ivf_probe_sweep at sf0.1). Submitting each branch as its own job
  * from a small driver pool lets a branch's tail back-fill the
  * scheduler with the next branch's tasks.
  *
  * Contract:
  *  - branches must be INDEPENDENT and deterministic — rows and schema
  *    are exactly the sequential union's (each branch is collected
  *    as-is, in branch order);
  *  - subplans SHARED between branches must be persisted AND eagerly
  *    materialized by the caller first — the sequential union's
  *    ReusedExchange sharing does not apply across separate jobs, and
  *    concurrent first-scans of a lazy cache each recompute the
  *    lineage (the documented sibling-scan gotcha);
  *  - the branches execute EAGERLY, at call time (the mmrRerank
  *    eager-boundary doctrine): the returned frame is a local relation
  *    of the collected rows. Plan-only consumers see the local
  *    relation, not the branch plans.
  */
object Branches {

  /** Collect every branch concurrently (pool of `poolSize` driver
    * threads) and return one local frame of their rows in branch
    * order, with the first branch's schema. */
  def unionAllConcurrent(branches: Seq[DataFrame],
                         poolSize: Int = 4): DataFrame = {
    require(branches.nonEmpty, "unionAllConcurrent needs >= 1 branch")
    val spark = branches.head.sparkSession
    val schema = branches.head.schema
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.max(1, math.min(poolSize, branches.size)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futures = branches.map(b => scala.concurrent.Future(b.collect()))
      val rows = scala.concurrent.Await
        .result(scala.concurrent.Future.sequence(futures),
          scala.concurrent.duration.Duration.Inf)
        .flatten
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, schema)
    } finally pool.shutdown()
  }

  /** Run independent thunks concurrently (same pool shape) and return
    * their results in input order — the training-stage counterpart of
    * [[unionAllConcurrent]] for overlapping independent driver-side
    * training loops whose jobs otherwise serialize. */
  def runConcurrent[T](thunks: Seq[() => T], poolSize: Int = 4): Seq[T] = {
    require(thunks.nonEmpty, "runConcurrent needs >= 1 thunk")
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.max(1, math.min(poolSize, thunks.size)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futures = thunks.map(t => scala.concurrent.Future(t()))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
  }
}
