package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zone-map (min/max statistics) modeling — the receipt layer for the
  * layout operators ([[ZOrder]], range partitioning): a clustered
  * layout is only worth its rewrite cost if it actually prunes scans,
  * and this module MEASURES that, per layout, per probe predicate,
  * without any engine internals. Build the per-file-group zone map
  * (one min/max/count row per group — the same stats parquet footers
  * and lakehouse manifests keep), then replay range predicates against
  * it: a group must be scanned iff `[min,max]` overlaps `[lo,hi]`.
  *
  * Scale shape: the zone map is one partial-aggregated group-by over
  * the table (one row per file group — metadata-sized output), and
  * probing is zone-map × probes with the PROBE side broadcast (probes
  * are a handful of predicates; the zone map itself never shuffles).
  * Comparing layouts = running the same probes against two zone maps:
  * the pruned-fraction delta is the layout's measured value.
  */
object ZoneMap {

  /** Per-group zone map: (bucket, min_v, max_v, n_rows). `bucketCol`
    * models the file-group assignment a writer would produce (a range
    * bucket, a Z-order tile, a hash bucket); `valueCol` is the column
    * predicates filter on.
    */
  def zones(df: DataFrame, bucketCol: String, valueCol: String): DataFrame =
    df.groupBy(col(bucketCol).as("bucket"))
      .agg(min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Scan cost of each probe range under a zone map: a group is
    * scanned iff its [min_v, max_v] overlaps [lo, hi] (inclusive).
    * Returns (probe_id, buckets_scanned, rows_scanned) — compare
    * against the zone map's totals for the pruned fraction. `probes`
    * is (probe_id, lo, hi), broadcast (it is a predicate list, not
    * data).
    */
  def probeScanStats(zoneMap: DataFrame, probes: DataFrame): DataFrame =
    zoneMap.crossJoin(broadcast(probes))
      .filter(col("max_v") >= col("lo") && col("min_v") <= col("hi"))
      .groupBy("probe_id")
      .agg(count(lit(1)).as("buckets_scanned"),
        sum(col("n_rows")).as("rows_scanned"))
}
