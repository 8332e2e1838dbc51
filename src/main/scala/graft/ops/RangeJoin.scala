package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: probe rows with a timestamp against
  * ranges `[start, end)` — "which promotional windows contain this sale",
  * "which maintenance window swallowed this event". The reference's
  * pipelines never join on ranges, but any training-data pipeline slicing
  * a corpus by crawl/collection windows does.
  *
  * Why not `probe.join(ranges, ts >= start && ts < end)`: a pure theta
  * join has no equi-key, so Spark plans BroadcastNestedLoopJoin (small
  * side) or a cartesian — O(|probe|·|ranges|) comparisons, a scale
  * killer the moment the range side stops fitting in one broadcast.
  *
  * The bucketed form restores an equi-key: time is gridded into
  * fixed-width buckets; each range explodes to the buckets it overlaps
  * (≤ ceil(span/width)+1 rows — bounded when range spans are bounded,
  * which is the contract), each probe row maps to exactly one bucket, and
  * the join becomes `probe.bucket = range.bucket` (hash join, shuffles on
  * the grid) followed by the exact residual predicate. Pick `width` near
  * the typical range span: too coarse packs many ranges per bucket, too
  * fine multiplies the range-side explosion.
  *
  * Arithmetic is pure integer micros (`unix_micros` / floor-div), so
  * results replay exactly in any engine; the residual keeps the
  * half-open `[start, end)` semantics.
  */
object RangeJoin {

  /** Inner range join: every (probe row, range row) pair with
    * `probe.tsCol ∈ [start, end)` — and, when `keyCols` is non-empty,
    * matching equality keys (both sides must carry the key columns under
    * the same names; the join dedups them). Output carries all columns of
    * both inputs; non-key column names must not collide (rename upstream).
    *
    * Pass the keys whenever the domain has them ("this user's events in
    * this user's window"): the equi-join key becomes (keys..., bucket), so
    * pair candidates are bounded per (key, bucket) instead of per bucket.
    * The unkeyed form's candidate volume grows with probe-density ×
    * range-density per bucket — measured exactly output-linear at the
    * 100× soak (BASELINE.md round 8), which is optimal for pure
    * containment but still quadratic in co-located densities; keys are
    * what keep those densities constant as the data grows.
    */
  def bucketedRangeJoin(probe: DataFrame, tsCol: String,
                        ranges: DataFrame, startCol: String, endCol: String,
                        widthMicros: Long,
                        keyCols: Seq[String] = Nil): DataFrame = {
    require(widthMicros > 0, s"widthMicros=$widthMicros must be positive")
    val w = lit(widthMicros)
    // NTZ-tolerant: parquet TIMESTAMP_NTZ casts to TIMESTAMP under the
    // (always-UTC) session zone, so the micros grid is identical either way
    def micros(c: String) =
      unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
    val p = probe.withColumn("__bucket", floor(micros(tsCol) / w))
    // end is exclusive: the last bucket a range touches is the one holding
    // end - 1µs (a range ending exactly on a grid line does not spill over).
    // Inverted/empty ranges (end <= start) are dropped BEFORE the explode:
    // the 2-arg sequence defaults to step -1 when stop < start, silently
    // exploding |span|/width junk buckets that only the residual filter
    // would discard — unbounded wasted work on bad input. The explicit
    // step=1 then documents (and enforces) the ascending contract.
    val r = ranges
      .filter(micros(endCol) > micros(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(micros(startCol) / w),
        floor((micros(endCol) - 1) / w),
        lit(1L))))
    p.join(r, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
