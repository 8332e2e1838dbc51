package graft

import org.apache.spark.sql.functions._

import graft.text.Decontaminate
import graft.streaming.DecontamIngest

class DecontamIngestSpec extends SparkTestBase {

  test("streaming admit == batch remove form, invariant under micro-batch splits") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val candidates = docs.filter(col("doc_id") < 150)
    val bench = docs.filter(col("doc_id") >= 150 && col("doc_id") < 600)

    val tmp = java.nio.file.Files.createTempDirectory("decontam_ingest_spec")
    val idx = tmp.resolve("idx").toString
    Decontaminate.writeBenchIndex(bench, "doc_id", "text", idx)

    val want = Decontaminate.removeNearContaminatedAgainstIndex(
        candidates, idx, "doc_id", "text", threshold = 0.9)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(want.nonEmpty, "fixture should admit some docs")
    assert(want.size < candidates.count(), "fixture should reject some docs")

    // spread the candidate side over several files, drain one per
    // micro-batch: the admitted union must equal the single-batch result
    val srcDir = tmp.resolve("src").toString
    candidates.repartition(5).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = DecontamIngest.start(spark, stream, idx, "doc_id", "text",
      threshold = 0.9,
      outPath = tmp.resolve("out").toString,
      checkpoint = tmp.resolve("ckpt").toString)
    q.awaitTermination()
    val admitted = spark.read.parquet(tmp.resolve("out").toString)
    assert(admitted.columns.contains("batch_id"), "segment key must be present")
    val got = admitted.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === want,
      "per-micro-batch decontam against the stored index must equal the batch run")

    // exactly-once: a retried micro-batch dynamically overwrites its own
    // batch_id partition — the admitted table is unchanged
    DecontamIngest.writeBatch(candidates.filter(col("doc_id") < 40), batchId = 0L,
      idx, "doc_id", "text", 0.9, tmp.resolve("out2").toString)
    val once = spark.read.parquet(tmp.resolve("out2").toString)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    DecontamIngest.writeBatch(candidates.filter(col("doc_id") < 40), batchId = 0L,
      idx, "doc_id", "text", 0.9, tmp.resolve("out2").toString)
    val twice = spark.read.parquet(tmp.resolve("out2").toString)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(twice === once, "a retried batch must not double-admit")

    // the gate composes with the index verbs: erasing a benchmark item
    // re-admits docs that only matched it
    val rejected = candidates.select("doc_id").collect().map(_.getLong(0)).toSet -- want
    assert(rejected.nonEmpty)
    // erase the whole benchmark -> everything is admitted
    Decontaminate.deleteFromBenchIndex(bench.select("doc_id"), idx)
    DecontamIngest.writeBatch(candidates, batchId = 9L,
      idx, "doc_id", "text", 0.9, tmp.resolve("out3").toString)
    val afterErase = spark.read.parquet(tmp.resolve("out3").toString).count()
    assert(afterErase === candidates.count(),
      "with the benchmark erased, the gate must admit every doc")
  }

  test("semantic stream admit == batch indexed-remove form, split-invariant, exactly-once") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val candidates = emb.filter(col("vec_id") % 10 =!= 1)
    val bench = emb.filter(col("vec_id") % 10 === 1)

    val tmp = java.nio.file.Files.createTempDirectory("semdecon_ingest_spec")
    val idx = tmp.resolve("idx").toString
    graft.similarity.Ann.writeEmbedNearDupIndex(bench, idx, nBits = 8)

    val want = graft.similarity.SemanticDecontam
      .removeSemanticContaminatedAgainstIndex(candidates, idx, tau = 0.3)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(want.nonEmpty && want.size < candidates.count(),
      "fixture must both admit and reject")

    val srcDir = tmp.resolve("src").toString
    candidates.repartition(4).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = DecontamIngest.startSemantic(spark, stream, idx, tau = 0.3,
      outPath = tmp.resolve("out").toString,
      checkpoint = tmp.resolve("ckpt").toString)
    q.awaitTermination()
    val got = spark.read.parquet(tmp.resolve("out").toString)
      .select("vec_id").orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got === want,
      "per-micro-batch semantic gate against the stored index must equal the batch run")

    // retried micro-batch replaces its own partition
    DecontamIngest.writeSemanticBatch(candidates.filter(col("vec_id") < 100), 0L,
      idx, 0.3, "vec_id", "embedding", tmp.resolve("out2").toString)
    val once = spark.read.parquet(tmp.resolve("out2").toString).count()
    DecontamIngest.writeSemanticBatch(candidates.filter(col("vec_id") < 100), 0L,
      idx, 0.3, "vec_id", "embedding", tmp.resolve("out2").toString)
    assert(spark.read.parquet(tmp.resolve("out2").toString).count() === once,
      "a retried batch must not double-admit")
  }
}
