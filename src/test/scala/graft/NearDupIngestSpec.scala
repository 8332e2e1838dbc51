package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDup
import graft.streaming.NearDupIngest

class NearDupIngestSpec extends SparkTestBase {

  test("streaming ingest near-dup == batch operator, invariant under micro-batch splits") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val newBatch = docs.filter(col("doc_id") < 150)
    val seen = docs.filter(col("doc_id") >= 150 && col("doc_id") < 600)
    val want = NearDup.minHashLshAgainstCorpus(
        newBatch, seen, "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(want.nonEmpty, "fixture should contain cross near-dups")

    // spread the new side over several files, then drain one file per
    // micro-batch: the appended union must equal the single-batch result
    val tmp = java.nio.file.Files.createTempDirectory("neardup_ingest_spec")
    val srcDir = tmp.resolve("src").toString
    newBatch.repartition(5).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = NearDupIngest.start(spark, stream, seen, "doc_id", "text",
      bands = 4, rowsPerBand = 4, threshold = 0.7,
      outPath = tmp.resolve("out").toString,
      checkpoint = tmp.resolve("ckpt").toString)
    q.awaitTermination()
    val got = spark.read.parquet(tmp.resolve("out").toString)
      .select("new_id", "seen_id", "jaccard") // drop the batch_id segment key
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(got === want,
      "per-micro-batch LSH against the static corpus must equal the batch run")

    // exactly-once: replaying a micro-batch (simulated sink-side retry)
    // dynamically overwrites its own batch_id partition — results unchanged
    NearDupIngest.writeBatch(newBatch.filter(col("doc_id") < 40), batchId = 0L, seen,
      "doc_id", "text", 4, 4, 0.7, tmp.resolve("out2").toString)
    val once = spark.read.parquet(tmp.resolve("out2").toString)
      .select("new_id", "seen_id", "jaccard")
      .orderBy("new_id", "seen_id").collect().toSeq
    NearDupIngest.writeBatch(newBatch.filter(col("doc_id") < 40), batchId = 0L, seen,
      "doc_id", "text", 4, 4, 0.7, tmp.resolve("out2").toString)
    val twice = spark.read.parquet(tmp.resolve("out2").toString)
      .select("new_id", "seen_id", "jaccard")
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(twice === once, "a retried batch must not double-append")
  }
}
