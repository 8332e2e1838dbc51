package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (gap-based), batch form: a session breaks when the
  * gap to the previous event of the same user exceeds `gapSeconds`.
  * One exchange (partition by user) shared by the lag and the running sum.
  * Timestamps are compared in exact integer microseconds so results are
  * reproducible against external engines.
  */
object Sessionize {

  def sessionIds(df: DataFrame, userCol: String, tsCol: String,
                 gapSeconds: Long, tieBreak: Seq[Column]): DataFrame = {
    val order = col(tsCol) +: tieBreak
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(us, 1).over(w)
    val isStart = when(prev.isNull || (us - prev) > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("session_id", sum(isStart).over(run))
  }

  /** Per-session rollup: bounds + size + value total. The microsecond
    * conversion is staged once and aggregated twice, same staging
    * discipline as the token/shingle projections elsewhere.
    */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   gapSeconds: Long, valueCol: String,
                   tieBreak: Seq[Column]): DataFrame =
    sessionIds(df, userCol, tsCol, gapSeconds, tieBreak)
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"),
        round(sum(col(valueCol)), 2).as("total_value"))
}
