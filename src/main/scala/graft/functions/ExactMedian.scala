package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Exact median over a double column, as a typed Catalyst
  * `Aggregator[IN, BUF, OUT]` — SURVEY.md §4's one custom-Aggregator
  * candidate. The reference's own median is the sketch
  * `percentile_approx(x, 0.5)` (`etl/transform_1.py:96`); this is the
  * exact counterpart for when an approximation is not acceptable.
  *
  * Semantics match DuckDB/ANSI `median`: NULL inputs are skipped, an
  * all-NULL or empty group is NULL, odd counts return the middle order
  * statistic, even counts the mean of the two middle ones.
  *
  * Scale shape, stated honestly: exact median is a HOLISTIC aggregate —
  * any exact algorithm must see every value of the group, so the buffer is
  * O(group size) (the same memory contract as `collect_list`, and the
  * reason `percentile_approx` stays the 100 TB default). The cost profile
  * is still the right one: `udaf` wraps this in `ScalaAggregator`, a
  * `TypedImperativeAggregate`, so the buffer lives as a plain JVM object —
  * values PREPEND in O(1) per row and the encoder only runs when partial
  * buffers ship for the merge. Partial aggregation stays map-side: the
  * shuffle carries one partial buffer per (partition × group), never one
  * row per value. Use it for per-key medians whose groups fit an executor;
  * for unbounded group cardinality reach for `percentile_approx`, and for
  * rolling medians [[graft.ops.Windows.rollingMedianExact]]'s bounded
  * frames.
  */
object ExactMedian extends Aggregator[java.lang.Double, List[Double], java.lang.Double] {

  override def zero: List[Double] = Nil

  // SQL aggregate null semantics: NULL inputs do not contribute
  override def reduce(buf: List[Double], v: java.lang.Double): List[Double] =
    if (v == null) buf else v.doubleValue :: buf

  override def merge(a: List[Double], b: List[Double]): List[Double] = a ::: b

  override def finish(buf: List[Double]): java.lang.Double =
    if (buf.isEmpty) null
    else {
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      val n = sorted.length
      if (n % 2 == 1) sorted(n / 2)
      // (lo + hi) / 2, the textbook even-count median. DuckDB's
      // quantile_cont interpolates lo + (hi - lo) * 0.5 — algebraically
      // equal, last-ulp different in IEEE; oracle comparisons on
      // non-integral inputs ROUND both sides (FIXTURES.md §3 playbook).
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    }

  override def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  /** Column-API handle: usable in `agg(...)` AND over unbounded window
    * frames (`exactMedian(c).over(Window.partitionBy(k))`) — the
    * windowed-median-without-frame-bounds case W6's bounded-frame
    * `collect_list` form does not cover.
    */
  lazy val fn: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(ExactMedian)

  def apply(c: Column): Column = fn(c)
}
