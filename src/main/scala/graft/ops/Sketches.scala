package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate sketches for corpus monitoring at scale — the answers a
  * 100 TB pipeline needs hourly ("how many distinct documents / tokens?",
  * "what does the length distribution look like?") where the exact form
  * is an unaffordable full shuffle of the key space.
  *
  * These are deliberately thin wrappers over Spark's codegen'd sketch
  * aggregates (HyperLogLog++ and the Greenwald–Khanna-style quantile
  * summary behind `percentile_approx`): both are one-pass,
  * partial-aggregable (map-side sketches merge associatively, so the
  * shuffle carries fixed-size sketch buffers, never the key space), and
  * mergeable across partitions — the properties that make them the right
  * tool where `COUNT(DISTINCT x)` would shuffle every distinct value.
  *
  * Not DuckDB-hash-checkable by construction (sketch estimates are
  * implementation-defined); SketchesSpec pins the error contract instead:
  * estimates land within the configured bound of the exact answer on the
  * test corpus.
  */
object Sketches {

  /** Per-key approximate distinct count (HyperLogLog++) with the exact
    * row count alongside — `rsd` is the target relative standard
    * deviation (default 5%). At 100 TB this is the dedup-monitoring
    * query: distinct fingerprints per source without shuffling the
    * fingerprint space.
    */
  def approxDistinctPerKey(df: DataFrame, keyCols: Seq[String],
                           valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Per-key approximate quantiles of a numeric column. `accuracy` is the
    * percentile_approx knob (higher = tighter, more memory; guarantees
    * rank error ≤ n/accuracy). Output: one row per key with an array
    * column `qs` aligned to `probs`.
    */
  def approxQuantilesPerKey(df: DataFrame, keyCols: Seq[String],
                            valueCol: String, probs: Seq[Double],
                            accuracy: Int = 10000): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(percentile_approx(
        col(valueCol),
        array(probs.map(lit): _*),
        lit(accuracy)).as("qs"))
}
