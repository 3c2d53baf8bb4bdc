package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for Spark-private Column↔Expression conversion
  * (ExpressionUtils is private[sql] in Spark 4; this bridge lives in the
  * sql package tree solely to expose the two conversions graft's custom
  * Catalyst expressions need). */
object CatalystBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a hand-built logical plan (Dataset.ofRows is
    * private[sql]); needed to hand graft's custom logical operators to
    * the analyzer/planner. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The AnalysisException Spark itself raises for a mis-aritied SQL
    * function call (error class WRONG_NUM_ARGS, SQLSTATE 42605) — used
    * by graft's injected-function builders, which otherwise die with a
    * bare NoSuchElementException from `exprs(i)`. */
  def wrongNumArgs(functionName: String, expected: Int,
                   actual: Int): org.apache.spark.sql.AnalysisException =
    new org.apache.spark.sql.AnalysisException(
      "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      Map("functionName" -> s"`$functionName`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  /** The AnalysisException Spark raises when a parameter that must be
    * a literal isn't one (error class NON_FOLDABLE_ARGUMENT, SQLSTATE
    * 42K08) — used by graft's injected-function builders that bake an
    * integer parameter (k, n) into the expression at plan time. */
  def nonFoldableArg(functionName: String, paramName: String)
      : org.apache.spark.sql.AnalysisException =
    new org.apache.spark.sql.AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$functionName`",
        "paramName" -> s"`$paramName`",
        "paramType" -> "\"INT\""))

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** COLUMNAR lineage cut: rebuild `df` as a fresh [[LogicalRDD]] leaf
    * over its own InternalRow RDD. Unlike the public
    * `createDataFrame(df.rdd, schema)` there is no InternalRow→Row→
    * InternalRow encode/decode detour (which also evicts the stage from
    * whole-stage codegen), and unlike `localCheckpoint` no origin
    * constraints are dragged along (those trip Union constraint
    * rewriting in iterative plans). The RDD is lazy; callers must
    * persist/materialize the result while the source plan is alive. */
  def internalLeaf(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = classic.sparkSession
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      org.apache.spark.sql.execution.LogicalRDD(
        classic.queryExecution.analyzed.output,
        classic.queryExecution.toRdd)(spark))
  }
}
