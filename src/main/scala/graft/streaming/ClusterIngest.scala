package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming duplicate-CLUSTER maintenance: a continuous feed of
  * near-dup PAIR edges (the output of the incremental detectors —
  * [[graft.streaming.NearDupIngest]], [[graft.dedup.NearDup
  * .simHashNearDupsAgainstCorpus]], exact batch-vs-history) is folded
  * into a persistent (id, cluster_id) labeling, one micro-batch at a
  * time, WITHOUT ever re-running connected components over the
  * historical pair graph. This closes the last batch-only step of the
  * ingest dedup loop: detect pairs incrementally → now also maintain
  * cluster ids incrementally.
  *
  * Store layout: `path/batch_id=<k>/` parquet segments holding ONLY the
  * rows [[graft.dedup.DupClusters.mergeComponentsDelta]] changed in
  * batch k (relabeled history ids + batch-new ids). The current
  * labeling is latest-per-id over the segments — so steady-state write
  * cost tracks how much actually MERGED in the batch, not history size,
  * and reads are one max_by aggregation (ties impossible: a delta
  * emits each id at most once per batch).
  *
  * Exactly-once: each batch reads only segments with `batch_id <
  * currentBatch` (its own partial rows from a crashed attempt are
  * invisible), recomputes the SAME delta (mergeComponentsDelta is a
  * pure function of that slice + the batch), and rewrites its own
  * partition under dynamic overwrite — a retried micro-batch replaces
  * instead of double-appending, the [[graft.ops.Segments]] contract.
  *
  * Batch-split invariance: component merging under the min-id contract
  * is associative (DupClusters scaladoc), so ANY micro-batch split of
  * the same pair set reads back the identical labeling — the one-shot
  * CC fixpoint (spec-pinned; the gate row shares q_dup_clusters'
  * recursive-CTE oracle verbatim).
  */
object ClusterIngest {

  private def storeExists(spark: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.{Path => HPath}
    val hPath = new HPath(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hPath)
  }

  /** Current labeling: latest segment row per id. `beforeBatch` slices
    * to `batch_id < b` — the write path's self-invisibility rule; reads
    * for consumers pass None (everything committed so far).
    */
  def readLabels(spark: SparkSession, path: String,
                 beforeBatch: Option[Long] = None): DataFrame = {
    val seg = spark.read.parquet(path)
    val sliced = beforeBatch.map(b => seg.filter(col("batch_id") < b)).getOrElse(seg)
    sliced.groupBy("id")
      .agg(max_by(col("cluster_id"), col("batch_id")).as("cluster_id"))
  }

  /** One micro-batch fold+write — public so a retry can be simulated. */
  def writeBatch(pairs: DataFrame, batchId: Long, path: String,
                 aCol: String = "id_a", bCol: String = "id_b"): Unit = {
    val spark = pairs.sparkSession
    val current =
      if (storeExists(spark, path)) readLabels(spark, path, beforeBatch = Some(batchId))
      // first segment: empty labeling typed like the batch's id column
      else pairs.select(col(aCol).as("id"), col(aCol).as("cluster_id")).limit(0)
    graft.ops.Segments.writer(
        graft.dedup.DupClusters.mergeComponentsDelta(current, pairs, aCol, bCol),
        "append", Some(batchId))
      .partitionBy("batch_id").parquet(path)
  }

  def start(spark: SparkSession, pairStream: DataFrame, path: String,
            checkpoint: String,
            aCol: String = "id_a", bCol: String = "id_b"): StreamingQuery =
    pairStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, path, aCol, bCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
