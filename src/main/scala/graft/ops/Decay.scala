package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-decayed aggregates — recency-weighted feature engineering
  * ("a purchase last week counts more than one last year"): per key,
  * the exponentially-decayed sum and count of an event value with a
  * configurable half-life, anchored at a caller-supplied reference
  * instant (pass the pipeline's logical run date — NOT the wall clock,
  * which would make the feature unreproducible).
  *
  * Determinism (NOTES.md fixed-point playbook): the decay weight
  * `0.5^(age_days/halflife)` goes through libm `pow`, so it is
  * micro-quantized PER ROW (exact integer age in days → one pow → one
  * ROUND) and the per-key aggregate is a product-of-integers sum —
  * exact in any partition-merge order, replayable engine-over-engine.
  * The reported decayed value divides the exact sum back out.
  *
  * Scale: one narrow projection + one partial-aggregated groupBy on the
  * key. No window, no self-join — ages come from arithmetic against the
  * reference instant, not from row-to-row comparison.
  */
object Decay {

  /** Per-key decayed aggregate of `valueCol` (milli-quantized, ≤3
    * decimals exact): (key, n_events, decayed_milli, decayed_value)
    * where `decayed_milli = Σ v_milli · w_micro` exactly and
    * `decayed_value = ROUND(decayed_milli / 1e9, 6)` — weights
    * `w_micro = ROUND(0.5^(age_days/halfLifeDays) · 1e6)`, ages in
    * whole days before `refEpochDay` (rows after the reference get
    * age 0, i.e. full weight — the caller decides the cutoff upstream).
    */
  def decayedSumPerKey(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, refEpochDay: Long,
                       halfLifeDays: Int): DataFrame = {
    require(halfLifeDays > 0, s"halfLifeDays=$halfLifeDays must be positive")
    val ageDays = greatest(
      lit(refEpochDay) - expr(s"unix_micros(CAST($tsCol AS TIMESTAMP)) div 86400000000"),
      lit(0L))
    val wMicro = round(
      pow(lit(0.5), ageDays.cast("double") / lit(halfLifeDays.toDouble))
        * lit(1000000.0)).cast("long")
    val vMilli = round(col(valueCol) * 1000).cast("long")
    df.select(col(keyCol), vMilli.as("__v"), wMicro.as("__w"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_events"),
        sum(col("__v") * col("__w")).as("decayed_milli"))
      .select(col(keyCol), col("n_events"), col("decayed_milli"),
        round(col("decayed_milli") / lit(1.0e9), 6).as("decayed_value"))
  }
}
