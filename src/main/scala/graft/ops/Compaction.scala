package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the table-maintenance pass every
  * long-lived 100 TB lake needs: streaming ingest and partitioned
  * writes leave thousands of kilobyte files per partition, and read
  * throughput collapses unless they are periodically rewritten into
  * target-sized outputs. The PLAN is pure metadata work: it consumes
  * the file listing (path, size), never the data, so it runs in
  * seconds regardless of table size — the expensive rewrite then
  * touches only the bins the plan names.
  *
  * Bin assignment is the deterministic streaming form: files in stable
  * (partition, file) order, each file lands in bin
  * `floor(bytes_before_it / target)` — a per-partition running sum, no
  * driver-side loop, no RNG, replayable on any engine. Bins can
  * overshoot `target` by at most one file (the classic next-fit
  * guarantee), which is exactly what compaction wants: never split a
  * file, never leave two undersized neighbors.
  *
  * The window partitions by the TABLE partition key: per-partition file
  * counts are metadata-scale (10³–10⁵), so a single task per partition
  * key holds the listing slice comfortably — this is the one place a
  * low-cardinality window is the right tool, because the input is a
  * listing, not rows.
  */
object Compaction {

  /** Per-bin compaction plan: (part, bin, n_files, total_bytes) for
    * every planned output group. `files` is one row per data file with
    * its partition value, a stable file identifier (path or index — the
    * plan's determinism rides on its ordering), and its size in bytes.
    */
  def planBins(files: DataFrame, partCol: String, fileCol: String,
               bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes=$targetBytes must be >= 1")
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__cb", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cb DIV ${targetBytes}L"))
      .groupBy(col(partCol).as("part"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"))
  }
}
