package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-stratum feature normalization — the "scale this column within its
  * group" step of a feature pipeline, as whole-partition window
  * aggregates: one exchange per key set, no driver-side statistics pass,
  * no second scan (the naive groupBy-stats-then-join-back shape reads the
  * fact table twice and shuffles it twice).
  *
  * Float-determinism discipline (NOTES.md playbook): the z-score derives
  * stddev from SUM/SUM(x²)/COUNT with the exact expression shape an
  * external engine can replay — `sqrt((Σx² − (Σx)²/n) / (n−1))` — rather
  * than `stddev_samp`, whose internal accumulation order is
  * implementation-defined.
  */
object Normalize {

  private def byKeys(keyCols: Seq[String]) =
    Window.partitionBy(keyCols.map(col): _*)

  /** Sample-stddev z-score of `valueCol` within each key group:
    * `(x − μ) / σ`. Groups with fewer than 2 rows or zero variance yield
    * NULL (`try_divide`), never ±Inf/NaN or an ANSI abort.
    */
  def zscore(df: DataFrame, keyCols: Seq[String], valueCol: String,
             outCol: String): DataFrame = {
    val w = byKeys(keyCols)
    val x = col(valueCol)
    val n = count(x).over(w)
    val sumX = sum(x).over(w)
    val sumX2 = sum(x * x).over(w)
    val mean = sumX / n
    // try_divide: n = 1 must be NULL, not an ANSI divide-by-zero abort;
    // greatest-0 clamp: catastrophic cancellation can leave the variance
    // a hair negative — clamp lands std at 0, which the outer try_divide
    // turns into NULL (greatest skips the n=1 NULL the same way)
    val varr = try_divide(sumX2 - sumX * sumX / n, n - lit(1))
    val std = sqrt(greatest(varr, lit(0.0)))
    df.withColumn(outCol, try_divide(x - mean, std))
  }

  /** Min-max scaling of `valueCol` to [0, 1] within each key group.
    * Constant groups (max = min) yield NULL, not a divide-by-zero.
    */
  def minMaxScale(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  outCol: String): DataFrame = {
    val w = byKeys(keyCols)
    val x = col(valueCol)
    val lo = min(x).over(w)
    val hi = max(x).over(w)
    df.withColumn(outCol, try_divide(x - lo, hi - lo))
  }

  /** Fixed-width histogram of `valueCol` per key group: one row per
    * (key, bin) with the bin's inclusive lower bound and count — the
    * distribution-profiling query of a corpus report, pure integer
    * arithmetic (replayable anywhere), partial-aggregated.
    */
  def histogram(df: DataFrame, keyCols: Seq[String], valueCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    val bin = (floor(col(valueCol) / binWidth) * binWidth).cast("long").as("bin_lo")
    df.groupBy((keyCols.map(col) :+ bin): _*)
      .agg(count(lit(1)).as("n"))
  }
}
