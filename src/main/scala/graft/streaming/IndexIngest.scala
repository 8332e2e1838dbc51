package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming INDEX maintenance at ingest: every micro-batch of new
  * documents is appended to a persistent retrieval index — the
  * production loop where a continuous feed keeps a search index warm
  * without ever rebuilding it from the 100 TB corpus.
  *
  * Mechanism: `foreachBatch` applies the batch APPEND operator per
  * micro-batch. All the appended indexes here are append-only by
  * construction (BM25 stores per-segment df/stats rows summed at read,
  * [[graft.text.Bm25]]; IVF/IVF-PQ assign against the STORED centroids
  * and codebooks, [[graft.similarity.Ivf]]/[[graft.similarity.Pq]]), so
  * a micro-batch append is one narrow pass over the batch and never
  * touches existing files — which also makes the result batch-split
  * invariant: any partitioning of the feed into micro-batches yields
  * the same final index tables (spec-pinned via query equivalence).
  *
  * Exactly-once caveat (shared with [[NearDupIngest]]): a batch retried
  * after a sink-side crash would append its segment twice; production
  * keys segments on `batchId` for idempotent retries. The finite
  * AvailableNow drain used by the driver contract never retries.
  */
object IndexIngest {

  /** Stream documents into a BM25 index previously initialized with
    * [[graft.text.Bm25.writeBm25Index]] (possibly over an empty base).
    */
  def startBm25(newDocs: DataFrame, indexPath: String, checkpoint: String,
                nBuckets: Int = 64,
                idCol: String = "doc_id", textCol: String = "text"): StreamingQuery =
    newDocs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.text.Bm25.appendBm25Index(batch, indexPath, nBuckets, idCol, textCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream vectors into an IVF index previously initialized with
    * [[graft.similarity.Ivf.writeIvfIndex]] — appended batches are
    * assigned to the STORED centroids.
    */
  def startIvf(newVecs: DataFrame, indexPath: String, checkpoint: String,
               idCol: String = "vec_id", vecCol: String = "embedding"): StreamingQuery =
    newVecs.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.similarity.Ivf.appendIvfIndex(batch, indexPath, idCol, vecCol)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
