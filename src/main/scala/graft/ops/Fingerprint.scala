package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Dataset fingerprinting and snapshot diffing — the anti-entropy
  * primitive for 100 TB table management: compare two snapshots (a
  * table and its replica, yesterday's ingest and today's re-run, the
  * source and the migrated copy) WITHOUT shuffling either one against
  * the other. Each snapshot folds to `nBuckets` (bucket, n_rows, fp)
  * rows — one scan, one partial-aggregated group-by each — and the diff
  * is a join of two bucket-count-sized tables. Only buckets whose
  * fingerprints disagree need row-level inspection afterwards, so the
  * expensive full-row compare is confined to the changed shards
  * (the Merkle-tree / anti-entropy repair shape, one level deep).
  *
  * The per-row hash is a 60-bit md5 over a canonical '|'-joined
  * rendering of the chosen columns, and the bucket fold is bitwise XOR:
  * commutative + associative (partition-order independent, map-side
  * combinable) and overflow-free — an arithmetic SUM of 60-bit hashes
  * silently wraps Long on big buckets in Spark but widens to HUGEINT in
  * other engines, which would make fingerprints engine-specific.
  * XOR's known blind spot (a row appearing an even number of times
  * cancels out) is covered by n_rows, which the diff also compares.
  */
object Fingerprint {

  /** Fold `df` to per-bucket fingerprints: (bucket, n_rows, fp).
    * Bucket is `md5Long(key) % nBuckets` so a given key always lands in
    * the same bucket on any engine and any partitioning; `cols` is the
    * canonical column list hashed per row (include the key; exclude
    * columns whose string rendering is engine-dependent, e.g. raw
    * doubles — cast those to fixed-point first).
    */
  def bucketFingerprints(df: DataFrame, keyCol: String, cols: Seq[String],
                         nBuckets: Int = 4096): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be >= 1")
    require(cols.nonEmpty, "cols must name at least one column")
    val rowHash = NearDup.md5Long(
      concat_ws("|", cols.map(c => col(c).cast("string")): _*))
    df.select((NearDup.md5Long(col(keyCol).cast("string")) % nBuckets)
        .as("bucket"),
        rowHash.as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("fp"))
  }

  /** Buckets where two snapshots disagree: full-outer join of the two
    * fingerprint folds, keeping buckets whose row count OR xor-hash
    * differ (a bucket emptied on one side still surfaces, as 0 rows /
    * fp 0). Output (bucket, n_rows_a, n_rows_b, fp_a, fp_b), one row
    * per changed bucket — the work list for targeted row-level repair.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
                   cols: Seq[String], nBuckets: Int = 4096): DataFrame = {
    val fa = bucketFingerprints(a, keyCol, cols, nBuckets)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_a", "fp" -> "fp_a"))
    val fb = bucketFingerprints(b, keyCol, cols, nBuckets)
      .withColumnsRenamed(Map("n_rows" -> "n_rows_b", "fp" -> "fp_b"))
    fa.join(fb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_rows_a"), lit(0L)).as("n_rows_a"),
        coalesce(col("n_rows_b"), lit(0L)).as("n_rows_b"),
        coalesce(col("fp_a"), lit(0L)).as("fp_a"),
        coalesce(col("fp_b"), lit(0L)).as("fp_b"))
      .filter(col("n_rows_a") =!= col("n_rows_b") ||
        col("fp_a") =!= col("fp_b"))
  }
}
