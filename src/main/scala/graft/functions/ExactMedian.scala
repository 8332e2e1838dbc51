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
  * values append unboxed in amortized O(1) per row ([[MedianBuf]]) and the
  * encoder only runs when partial
  * buffers ship for the merge. Partial aggregation stays map-side: the
  * shuffle carries one partial buffer per (partition × group), never one
  * row per value. Use it for per-key medians whose groups fit an executor;
  * for unbounded group cardinality reach for `percentile_approx`, and for
  * rolling medians [[graft.ops.Windows.rollingMedianExact]]'s bounded
  * frames.
  */
/** Growable UNBOXED median buffer: a primitive `Array[Double]` with
  * amortized-O(1) doubling appends. The first cut used `List[Double]` and
  * died at the 100× soak (386 s for 3 × 20 M-value groups): cons cells box
  * every element at ~64 bytes and shred the GC, where the primitive array
  * stores 8 bytes/value and encodes as a compact unsafe array for the
  * shuffle. `var` fields are fine for an Aggregator buffer (the contract
  * allows in-place mutation) and fine for the encoder (constructor
  * params); capacity slack beyond `n` ships in the partial-buffer
  * serialization — bounded at 2× by the doubling policy, a few MB per
  * partial, paid only at the exchange.
  */
final case class MedianBuf(var values: Array[Double], var n: Int)

object ExactMedian extends Aggregator[java.lang.Double, MedianBuf, java.lang.Double] {

  private def append(b: MedianBuf, x: Double): MedianBuf = {
    if (b.n == b.values.length) {
      b.values = java.util.Arrays.copyOf(b.values, math.max(16, b.values.length * 2))
    }
    b.values(b.n) = x
    b.n += 1
    b
  }

  override def zero: MedianBuf = MedianBuf(Array.emptyDoubleArray, 0)

  // SQL aggregate null semantics: NULL inputs do not contribute
  override def reduce(buf: MedianBuf, v: java.lang.Double): MedianBuf =
    if (v == null) buf else append(buf, v.doubleValue)

  override def merge(a: MedianBuf, b: MedianBuf): MedianBuf = {
    val need = a.n + b.n
    if (need > a.values.length) {
      a.values = java.util.Arrays.copyOf(a.values,
        math.max(need, math.max(16, a.values.length * 2)))
    }
    System.arraycopy(b.values, 0, a.values, a.n, b.n)
    a.n = need
    a
  }

  override def finish(buf: MedianBuf): java.lang.Double =
    if (buf.n == 0) null
    else {
      val sorted = java.util.Arrays.copyOf(buf.values, buf.n)
      java.util.Arrays.sort(sorted)
      val n = sorted.length
      if (n % 2 == 1) sorted(n / 2)
      // (lo + hi) / 2, the textbook even-count median. DuckDB's
      // quantile_cont interpolates lo + (hi - lo) * 0.5 — algebraically
      // equal, last-ulp different in IEEE; oracle comparisons on
      // non-integral inputs ROUND both sides (FIXTURES.md §3 playbook).
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    }

  override def bufferEncoder: Encoder[MedianBuf] = ExpressionEncoder()
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
