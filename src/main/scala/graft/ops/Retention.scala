package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention over an event log — the third leg of the
  * product-analytics trio ([[Sessionize]], [[Funnel]], this): users are
  * cohorted by the week of their first anchor event (e.g. signup), and
  * each cohort reports how many members were active again k weeks later.
  *
  * Week indexing is INTEGER division of epoch-micros by the week length
  * (`us div 604800000000`) — no calendar library, no timezone, no float:
  * two engines cannot disagree on a bucket, and the week index orders and
  * subtracts exactly.
  *
  * Scale shape: the anchor table is one partial-aggregated min per user;
  * the activity table is `(user, week) DISTINCT` — both shuffle on the
  * user key (cardinality = population). The final roll-up is a count
  * distinct per (cohort, offset) over rows already deduped per
  * (user, week), so the heavy dedup happened where the key was wide.
  * Nothing here is a window over a low-cardinality key.
  */
object Retention {

  private val WeekMicros = 7L * 86400L * 1000000L

  /** Weekly cohort retention: (cohort_week, week_offset, cohort_size,
    * n_active, retention) for offsets 0..`maxWeeks`. `cohort_week` is the
    * absolute week index of the cohort's anchor; offset 0 is the anchor
    * week itself (retention 1.0 unless a user anchors and never acts —
    * impossible by construction, the anchor IS activity).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, anchorType: String,
                      maxWeeks: Int): DataFrame = {
    require(maxWeeks >= 0, s"maxWeeks=$maxWeeks must be non-negative")
    val week = expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div $WeekMicros")
    val base = events.select(col(userCol).as("user_key"), week.as("week"),
      col(typeCol).as("__etype"))
    val anchors = base.filter(col("__etype") === anchorType)
      .groupBy("user_key").agg(min(col("week")).as("cohort_week"))
    val sizes = anchors.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    val activity = base.select("user_key", "week").distinct()
    val active = anchors.join(activity, "user_key")
      .withColumn("week_offset", (col("week") - col("cohort_week")).cast("int"))
      .filter(col("week_offset") >= 0 && col("week_offset") <= maxWeeks)
      .groupBy("cohort_week", "week_offset")
      .agg(count_distinct(col("user_key")).as("n_active"))
    active.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"),
        round(try_divide(col("n_active"), col("cohort_size")), 6).as("retention"))
  }
}
