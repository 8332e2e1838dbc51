package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — the 4× storage/bandwidth path for vector
  * corpora: symmetric per-vector int8 (`q[i] = round(x[i]·127/maxabs)`,
  * one float scale per vector), the scheme FAISS/ScaNN-style stores use
  * for coarse scoring with exact re-ranking on the float originals.
  *
  * Determinism: the scale chain is three IEEE-exact single operations
  * (abs → max, multiply, divide) on the raw float values, identical in
  * any engine; the only rounding is the final half-away `round` per
  * element, and the reported scale is micro-quantized. No library calls,
  * no order-dependent float sums — the max is order-free.
  *
  * Shape: pure per-row array work (no shuffle). The element loop runs as
  * higher-order functions — CodegenFallback, but each evaluates ONCE per
  * row over the d-element array (the O(n²) HOF trap of NOTES.md applies
  * to re-split/re-derive patterns, not a single bounded transform).
  */
object Quantize {

  private def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x)))

  /** Quantize `vecCol` (array<float>) to int8: returns the input columns
    * plus `scale_micro` (the per-vector dequant scale maxabs/127, in
    * micro-units) and `q8` (array<tinyint> in [-127, 127]; an all-zero
    * vector quantizes to all zeros with scale 0).
    */
  def toInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val ma = maxAbs(v)
    df.withColumn("__ma", ma)
      .withColumn("scale_micro",
        round(col("__ma") / lit(127.0) * lit(1000000.0)).cast("long"))
      .withColumn("q8",
        when(col("__ma") === 0.0,
          transform(v, _ => lit(0).cast("tinyint")))
          .otherwise(transform(v,
            x => round(x * lit(127.0) / col("__ma")).cast("tinyint"))))
      .drop("__ma")
  }
}
