package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.Ascending
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.CatalystBridge

/** §2 #18 (native path) — as-of join as a first-class operator:
  * custom LogicalPlan + Strategy + physical BinaryExecNode, the
  * SURVEY §2 preference-order (c) route for semantics Spark lacks.
  *
  * Semantics: for every left row, attach the LAST right row with the
  * same key and `rightTime < leftTime` (strictly earlier), or nulls.
  * Equivalent to DuckDB `ASOF LEFT JOIN ... ON k = k AND lt > rt`.
  *
  * Physical shape (the whole point at 100 TB): EnsureRequirements
  * hash-partitions both sides on the key and sorts them by (key, time)
  * — the same cost as one sort-merge join — then a single forward merge
  * pass per partition emits matches. No range explosion, no window
  * re-scan, state = one buffered right row.
  */
object AsofJoinNative {

  /** Match direction: BACKWARD = last right strictly before the left
    * time (the classic as-of); FORWARD = first right strictly after it
    * (the "next event" lookup — pandas merge_asof direction=forward,
    * DuckDB `ON lt < rt`). Both are one forward merge pass over the
    * same (key, time) sort — FORWARD just peeks instead of folding. */
  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression,
                          direction: Direction = Backward)
      extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKey: Expression, rightKey: Expression,
                          leftTime: Expression, rightTime: Expression,
                          direction: Direction = Backward)
      extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

    private def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case other =>
        throw new IllegalArgumentException(
          s"asof join keys/times must be integral/timestamp, got $other")
    }

    /** Null-safe eval: None for a null key/time. A left row with a null
      * key or time matches nothing (SQL null-join semantics → emit the
      * null-extended row, like DuckDB's ASOF LEFT JOIN); a right row
      * with nulls can never be a match and is skipped. */
    private def evalLong(e: Expression, row: InternalRow): Option[Long] =
      Option(e.eval(row)).map(asLong)

    override protected def doExecute(): RDD[InternalRow] = {
      val lKey = BindReferences.bindReference(leftKey, left.output)
      val lTime = BindReferences.bindReference(leftTime, left.output)
      val rKey = BindReferences.bindReference(rightKey, right.output)
      val rTime = BindReferences.bindReference(rightTime, right.output)
      val rWidth = right.output.size
      val schema = output

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val proj = UnsafeProjection.create(schema, schema)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rWidth)
        // unsafe iterators reuse row objects — buffer a private copy
        val rBuf = rIter.map(_.copy()).buffered
        var lastMatch: InternalRow = null
        var matchKey: Long = 0L
        var haveKey = false

        lIter.map { l =>
          val lkOpt = evalLong(lKey, l)
          val ltOpt = evalLong(lTime, l)
          if (lkOpt.isEmpty || ltOpt.isEmpty) {
            // null key/time joins nothing: emit the null-extended row
            proj(joined(l, nullRight))
          } else {
            val lk = lkOpt.get
            val lt = ltOpt.get
            if (!haveKey || matchKey != lk) { lastMatch = null }
            // skip right rows that can never match any left row: null
            // key/time, or keys before ours (left keys only grow)
            var scanning = true
            while (scanning && rBuf.hasNext) {
              val rk = evalLong(rKey, rBuf.head)
              if (rk.isEmpty || evalLong(rTime, rBuf.head).isEmpty
                || rk.get < lk) rBuf.next()
              else scanning = false
            }
            direction match {
              case Backward =>
                // fold in right rows of our key strictly before our time
                while (rBuf.hasNext && evalLong(rKey, rBuf.head).contains(lk)
                  && evalLong(rTime, rBuf.head).exists(_ < lt)) {
                  lastMatch = rBuf.next()
                }
              case Forward =>
                // discard rights of our key at-or-before our time (they
                // can never match a later, even-larger left time), then
                // PEEK the head: it is the first strictly-later right —
                // left in the buffer because it may also serve the next
                // left row
                while (rBuf.hasNext && evalLong(rKey, rBuf.head).contains(lk)
                  && evalLong(rTime, rBuf.head).exists(_ <= lt)) {
                  rBuf.next()
                }
                lastMatch =
                  if (rBuf.hasNext && evalLong(rKey, rBuf.head).contains(lk))
                    rBuf.head
                  else null
            }
            matchKey = lk; haveKey = true
            proj(joined(l, if (lastMatch == null) nullRight else lastMatch))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy (installed via GraftExtensions or
    * `spark.experimental.extraStrategies`). */
  object AsofStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinPlan(l, r, lk, rk, lt, rt, dir) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir) :: Nil
      case _ => Nil
    }
  }

  /** User API: as-of join two DataFrames. Installs the strategy on the
    * session if absent (idempotent). Right-side columns must not share
    * attribute lineage with the left (alias them first). */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               direction: Direction = Backward): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy
    val lp = CatalystBridge.analyzed(left)
    val rp = CatalystBridge.analyzed(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
    CatalystBridge.ofRows(spark, AsofJoinPlan(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTime), attr(rp, rightTime), direction))
  }

  /** Query twin of operators.AsofJoin.asofJoin, through the native
    * operator — same DuckDB ASOF JOIN oracle. */
  def asofJoinNative(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val rights = orders.select(col("o_custkey").as("r_ck"),
      col("o_orderdate").as("r_od")).distinct()
    asofJoin(orders, rights, "o_custkey", "r_ck", "o_orderdate", "r_od")
      .select(col("o_orderkey"),
        date_format(col("r_od"), "yyyy-MM-dd").as("prev_day"),
        datediff(col("o_orderdate"), col("r_od")).as("gap_days"))
      .orderBy("o_orderkey")
  }

  /** §2 #168 — FORWARD as-of join: each order joined to the NEXT
    * distinct order date of its customer (the "time to next event"
    * lookup that backs churn and re-engagement features). Same merge
    * shape, same DuckDB oracle family (`ON lt < rt`). */
  def asofJoinForward(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val rights = orders.select(col("o_custkey").as("r_ck"),
      col("o_orderdate").as("r_od")).distinct()
    asofJoin(orders, rights, "o_custkey", "r_ck", "o_orderdate", "r_od",
      Forward)
      .select(col("o_orderkey"),
        date_format(col("r_od"), "yyyy-MM-dd").as("next_day"),
        datediff(col("r_od"), col("o_orderdate")).as("gap_days"))
      .orderBy("o_orderkey")
  }
}
