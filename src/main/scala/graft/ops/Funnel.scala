package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step conversion funnels over an event log — "view → click →
  * purchase within 7 days", the product-analytics query a sessionized
  * event lake answers constantly.
  *
  * Semantics (first-touch): per user, step 1 anchors at the user's
  * EARLIEST step-1 event; each later step is the earliest matching event
  * STRICTLY after the previous step and within `horizonMicros` of the
  * anchor. `depth` counts consecutive steps reached; a user converts iff
  * the last step is reached in-horizon.
  *
  * Shape: one narrow projection of the log, then one (join + partial
  * agg) per step, ALL keyed on the user — Catalyst plans the chain as
  * successive hash joins/aggs on the same key, so the log shuffles once
  * per step at most and reuses the partitioning when AQE keeps it
  * aligned; state per user is the accumulated step timestamps, never the
  * event list. No window over a low-cardinality key, no self-join on
  * time ranges (the candidate filter is applied during the per-step
  * aggregation, so out-of-horizon events die in the partial agg).
  */
object Funnel {

  /** Per-user funnel detail: (user, t1..tn epoch-micros — NULL once a
    * step is missed — depth, converted). Timestamps stay integer micros:
    * exact to compare, exact to hash, engine-neutral.
    */
  def firstTouch(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String],
                 horizonMicros: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(horizonMicros > 0, s"horizonMicros=$horizonMicros must be positive")
    val base = events.select(col(userCol).as("user_key"),
      col(typeCol).as("__etype"), unix_micros(col(tsCol).cast("timestamp")).as("__us"))
    val s1 = base.filter(col("__etype") === steps.head)
      .groupBy("user_key").agg(min(col("__us")).as("t1"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(s1) { case (acc, (step, i)) =>
      val prev = s"t$i"
      val cur = s"t${i + 1}"
      val cand = base.filter(col("__etype") === step)
        .select(col("user_key"), col("__us"))
      val groupCols = col("user_key") +: (1 to i).map(j => col(s"t$j"))
      acc.join(cand, Seq("user_key"), "left")
        .groupBy(groupCols: _*)
        .agg(min(when(col("__us") > col(prev)
          && col("__us") <= col("t1") + horizonMicros, col("__us"))).as(cur))
    }
    val tCols = (1 to steps.size).map(i => col(s"t$i"))
    chained.select(
      (col("user_key").as("user_id") +: tCols) :+
        tCols.map(t => when(t.isNotNull, 1).otherwise(0))
          .reduce(_ + _).as("depth") :+
        tCols.last.isNotNull.as("converted"): _*)
  }

  /** Step-level funnel summary off the per-user detail: one row per step
    * with the users reaching it and the conversion share vs step 1.
    */
  def summary(detail: DataFrame, steps: Seq[String]): DataFrame = {
    val counts = detail.agg(
      count(col("t1")).as(s"__n1"),
      steps.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"__n${i + 1}")): _*)
    val entries = steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1).as("step"), lit(name).as("step_name"),
        col(s"__n${i + 1}").as("n_users"))
    }
    counts.select(explode(array(entries: _*)).as("m"), col("__n1"))
      .select(col("m.step").as("step"), col("m.step_name").as("step_name"),
        col("m.n_users").as("n_users"),
        round(try_divide(col("m.n_users"), col("__n1")), 6).as("frac_of_entry"))
  }
}
