package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trailing-window distinct-key counts — the rolling DAU/WAU/MAU query
  * ("distinct users active in the 7 days ending at each day"), which no
  * window frame can express because COUNT(DISTINCT) is not frame-mergeable.
  *
  * Shape: the raw stream first collapses to distinct (day, key) rows —
  * the only pass that touches full data volume, a partial-aggregated
  * dedup — then each such row fans out to the `windowDays` report days it
  * contributes to (explode factor = window length over rows that are
  * already day-granular, NOT over raw events) and a second distinct +
  * count per day closes it. Every stage is a hash aggregation on narrow
  * (date, key) rows with map-side partials; nothing is sorted and no
  * per-day state grows beyond the distinct-key set itself. The
  * alternative — a day × window range self-join — builds the identical
  * row multiset but as a join DuckDB/Spark plan as BNL unless bucketed;
  * the explode IS the bucketing, written out.
  *
  * An approximate variant at extreme cardinality belongs to the sketch
  * tier ([[Sketches]] HLL union-merge); this is the exact form.
  */
object RollingDistinct {

  /** For every day observed in `df`: the number of distinct `keyCol`
    * values seen on that day or the `windowDays - 1` days before it.
    * Returns (day, active) ordered nowhere — callers sort.
    */
  def activeKeys(df: DataFrame, tsCol: String, keyCol: String,
                 windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays=$windowDays must be >= 1")
    val dayKey = df
      .select(to_date(col(tsCol)).as("day"), col(keyCol).as("k"))
      .distinct()
    val observed = dayKey.select("day").distinct()
    // fan each (day, key) forward onto every report day it falls inside,
    // clip to days that actually occur, and de-dup (one key can reach the
    // same report day from several active days inside the window)
    dayKey
      .select(explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1),
        expr("interval 1 day"))).as("day"), col("k"))
      .join(observed, "day")
      .distinct()
      .groupBy("day")
      .agg(count(lit(1)).as("active"))
  }
}
