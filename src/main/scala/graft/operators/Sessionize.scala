package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** §2 #20 — gap-based sessionization (batch). Streaming twin:
  * [[graft.streaming.Sessionizer]] (flatMapGroupsWithState).
  *
  * A session breaks when the gap to the previous event of the same user
  * exceeds `gapMinutes`. Classic lag→flag→cumsum: one shuffle on
  * user_id, then two windows over the SAME partitioning (Catalyst plans
  * a single exchange), then the final per-session aggregate — shapes
  * that hold at any scale because state never leaves the user's
  * partition. All timestamps exact integer microseconds.
  */
object Sessionize {

  def sessionize(spark: SparkSession, sfDir: String,
                 gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes.toLong * 60 * 1000000
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull
          || col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum("is_new").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"))
      .orderBy("user_id", "session_idx")
  }

  def oracle(gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes.toLong * 60 * 1000000
    s"""SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         count(*) AS n_events,
         min(ts_us) AS start_us,
         max(ts_us) - min(ts_us) AS duration_us
        FROM (
          SELECT user_id, ts_us,
            sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM (
            SELECT user_id, event_id, ts_us,
              CASE WHEN prev_us IS NULL OR ts_us - prev_us > $gapUs
                   THEN 1 ELSE 0 END AS is_new
            FROM (
              SELECT user_id, event_id,
                epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER
                  (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                  AS prev_us
              FROM events)))
        GROUP BY 1, 2 ORDER BY 1, 2"""
  }
}
