package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.pipeline.Transform

/** EP1's event-driven shape (S3 ObjectCreated → per-file job run,
  * `lambda/handler_last_date.py:24-42`) as Structured Streaming: a parquet
  * file source discovers new files, `Trigger.AvailableNow` drains whatever
  * arrived and stops, and `foreachBatch` applies the same batch transform
  * + dynamic-partition upsert the reference's Glue job performs.
  *
  * The checkpoint replaces the reference's Glue job-bookmark (O4): files
  * already processed are never re-read, so repeated invocations are
  * incremental — the streaming-native version of "one Lambda per new
  * object" that scales to thousands of files per trigger without one
  * cluster spin-up each.
  */
object IncrementalIngest {

  def start(spark: SparkSession, rawDir: String, schema: StructType,
            refinedLocation: String, checkpoint: String,
            partitionKeys: Seq[String] = Seq("data_pregao", "codigo_acao"),
            transform: DataFrame => DataFrame = Transform.transformV2): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1000") // bound a batch at scale
      .parquet(rawDir)
    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // APPEND, not dynamic overwrite: one AvailableNow drain spans many
        // micro-batches, and a partition whose rows land in two batches
        // would have the first batch's rows silently replaced by the
        // second. The checkpoint makes file intake exactly-once; replace-
        // the-partition upsert semantics belong to the per-run batch entry
        // (`Pipeline.runIncremental`), where one invocation = one file set.
        transform(batch).write
          .partitionBy(partitionKeys: _*)
          .mode(org.apache.spark.sql.SaveMode.Append)
          .option("compression", "snappy")
          .parquet(refinedLocation)
      }
      .start()
    query.awaitTermination()
  }
}
