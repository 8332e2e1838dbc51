package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling z-score anomaly detection over a keyed event log — the
  * monitoring query of a metrics lake: flag an event whose value sits
  * more than `k` sample standard deviations from the mean of the
  * preceding `n` events of the same key.
  *
  * The flag is computed ENTIRELY in exact integer arithmetic. Values are
  * quantized to milli-units (exact when inputs carry ≤3 decimals), the
  * prior-window mean/variance live as integer sums S = Σv, Q = Σv², and
  * the z² threshold compare
  *
  *   (x − S/m)² > k² · (mQ − S²)/(m(m−1))
  *
  * is cleared of divisions by multiplying through by m²(m−1) > 0:
  *
  *   (m−1)·(mx − S)² > k²·m·(mQ − S²)
  *
  * so two engines cannot disagree by a float ulp at the flag boundary —
  * the classic cross-engine failure of naive stddev-based alerting.
  * (Bounds: |v| ≤ 5·10⁵ milli and n ≤ 100 keep every product far inside
  * BIGINT; ANSI mode would abort loudly, not wrap, if a caller blew
  * them.)
  *
  * Scale shape: one window over the key — cardinality = |keys|, which in
  * an event lake is the user/device population and grows with the data
  * (the Normalize low-cardinality caveat does not apply); bounded ROWS
  * frame → O(n) state per partition, no self-join, no explode.
  */
object Anomaly {

  /** Flag per event: (key, id, us, v_milli, n_prior, is_anomaly) —
    * `is_anomaly` is false until `minPrior` prior events exist (a cold
    * key has no baseline to deviate from).
    */
  def rollingZFlags(events: DataFrame, keyCol: String, tsCol: String,
                    idCol: String, valueCol: String,
                    n: Int, k: Int, minPrior: Int): DataFrame = {
    require(n >= 2 && minPrior >= 2 && minPrior <= n,
      s"need 2 <= minPrior=$minPrior <= n=$n for a sample variance")
    require(k > 0, s"k=$k must be positive")
    // the scaladoc's BIGINT-overflow safety argument assumes n ≤ 100 —
    // enforce it, since on an ANSI-off session a blown bound would WRAP
    // (flip flags) instead of abort. The |v| ≤ 5·10⁵-milli half of the
    // bound is data-dependent and NOT checked per row (a scan-speed
    // operator must not pay a per-row guard): run ANSI-on — every graft
    // session builder does — for the abort-loudly guarantee on values.
    require(n <= 100, s"n=$n must be <= 100 (BIGINT overflow headroom: " +
      "(m-1)*dev^2 and k^2*m*varTerm stay inside 2^63 only for n <= 100)")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-n, -1)
    val withSums = events
      .withColumn("v_milli", round(col(valueCol) * 1000).cast("long"))
      // v² is projected BEFORE the window columns: an aggregate over an
      // unprojected product forces Catalyst to stack a second Window pass
      // (same spec, same exchange, but a full extra pass over the sorted
      // partition); with the input column materialized, all three
      // aggregates collapse into ONE Window operator
      .withColumn("__v2", col("v_milli") * col("v_milli"))
      .withColumn("n_prior", count(col("v_milli")).over(w))
      .withColumn("__s", sum(col("v_milli")).over(w))
      .withColumn("__q", sum(col("__v2")).over(w))
    val m: Column = col("n_prior")
    val dev = m * col("v_milli") - col("__s")
    val varTerm = m * col("__q") - col("__s") * col("__s")
    withSums.select(col(keyCol), col(idCol),
      unix_micros(col(tsCol).cast("timestamp")).as("us"), col("v_milli"), col("n_prior"),
      (m >= minPrior && (m - 1) * dev * dev > lit(k.toLong * k) * m * varTerm)
        .as("is_anomaly"))
  }
}
