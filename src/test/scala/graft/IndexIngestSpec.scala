package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, Ivf}
import graft.streaming.IndexIngest
import graft.text.Bm25

class IndexIngestSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def streamOf(path: String, filter: org.apache.spark.sql.Column) = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema)
      .option("basePath", new java.io.File(path).getParent)
      .parquet(path + "*").filter(filter)
  }

  test("streaming BM25 ingest: drained index ≡ whole-corpus from-raw retrieval") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_bm25")
    val idx = tmp.resolve("idx").toString
    Bm25.writeBm25Index(docs.filter(col("doc_id") % 2 === 0), idx, nBuckets = 16)
    val q = IndexIngest.startBm25(
      streamOf("/root/testdata/sf0.001/documents.parquet", col("doc_id") % 2 === 1),
      idx, tmp.resolve("ckpt").toString, nBuckets = 16)
    q.awaitTermination()
    val queries = docs.filter(col("doc_id") < 3)
    val stored = Bm25.topKAgainstIndex(queries, idx, k = 10, nBuckets = 16)
      .collect().map(_.toString).toSet
    val fromRaw = Bm25.topK(docs, queries, k = 10)
      .collect().map(_.toString).toSet
    assert(stored === fromRaw)
    assert(stored.nonEmpty)
  }

  test("streaming IVF ingest: drained index ≡ stored-centroid from-raw ≡ brute force") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_ivf")
    val idx = tmp.resolve("idx").toString
    val partA = emb.filter(col("vec_id") % 2 === 0)
    Ivf.writeIvfIndex(partA, nLists = 8, idx)
    val q = IndexIngest.startIvf(
      streamOf("/root/testdata/sf0.001/embeddings.parquet", col("vec_id") % 2 === 1),
      idx, tmp.resolve("ckpt").toString)
    q.awaitTermination()
    val queries = emb.filter(col("vec_id") < 5)
    val stored = Ivf.topKAgainstIndex(queries, idx, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().map(_.toString).toSet
    // nProbe = nLists ⇒ must equal brute force over the full corpus
    val brute = Ann.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "rank", "cid", "cosine").collect().map(_.toString).toSet
    assert(stored === brute)
  }

  test("exactly-once: a replayed BM25 micro-batch does not double-append") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_bm25_retry")
    val idx = tmp.resolve("idx").toString
    Bm25.writeBm25Index(docs.filter(col("doc_id") < 200), idx, nBuckets = 8)
    val batch = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
    IndexIngest.appendBm25Batch(batch, batchId = 7L, idx, 8, "doc_id", "text")
    val queries = docs.filter(col("doc_id") < 3)
    val once = Bm25.topKAgainstIndex(queries, idx, k = 10, nBuckets = 8)
      .collect().map(_.toString).toSet
    // simulated sink-side retry: same batch id, same content
    IndexIngest.appendBm25Batch(batch, batchId = 7L, idx, 8, "doc_id", "text")
    val twice = Bm25.topKAgainstIndex(queries, idx, k = 10, nBuckets = 8)
      .collect().map(_.toString).toSet
    assert(twice === once,
      "a retried micro-batch must replace its own segment, not inflate df/N")
    // and the index still equals the from-raw run over base + batch
    val fromRaw = Bm25.topK(docs.filter(col("doc_id") < 300), queries, k = 10)
      .collect().map(_.toString).toSet
    assert(twice === fromRaw)
  }

  test("exactly-once: a replayed IVF micro-batch does not double-append") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_ivf_retry")
    val idx = tmp.resolve("idx").toString
    Ivf.writeIvfIndex(emb.filter(col("vec_id") % 2 === 0), nLists = 8, idx)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    IndexIngest.appendIvfBatch(batch, batchId = 3L, idx, "vec_id", "embedding")
    IndexIngest.appendIvfBatch(batch, batchId = 3L, idx, "vec_id", "embedding")
    // a double-appended list would surface duplicate cids in the probe
    val queries = emb.filter(col("vec_id") < 5)
    val got = Ivf.topKAgainstIndex(queries, idx, k = 10, nProbe = 8)
      .select("qid", "rank", "cid", "cosine").collect().map(_.toString).toSet
    val brute = Ann.bruteForceTopK(emb, queries, k = 10)
      .select("qid", "rank", "cid", "cosine").collect().map(_.toString).toSet
    assert(got === brute)
    // physically: exactly one batch_id=3 segment's worth of rows
    val n = spark.read.parquet(s"$idx/lists").count()
    assert(n === emb.count(), s"lists hold $n rows, want ${emb.count()}")
  }

  test("compaction cadence inside the ingest loop bounds segment count; queries identical") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_bm25_fold")
    val idx = tmp.resolve("idx").toString
    Bm25.writeBm25Index(docs.filter(col("doc_id") < 100), idx, nBuckets = 4)
    // 10 micro-batches with a fold every 3rd batch
    (0 until 10).foreach { b =>
      IndexIngest.appendBm25Batch(
        docs.filter(col("doc_id") >= 100 + b * 50 && col("doc_id") < 150 + b * 50),
        batchId = b.toLong, idx, 4, "doc_id", "text", compactEvery = 3)
    }
    // segment dirs bounded: base + ≤1 fold output + the un-folded tail
    val segDirs = new java.io.File(s"$idx/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id=")).map(_.getName)
    assert(segDirs.length <= 5, s"segment count must stay bounded, got ${segDirs.toSeq}")
    // results identical to the no-compaction twin
    val queries = docs.filter(col("doc_id") < 3)
    val got = Bm25.topKAgainstIndex(queries, idx, k = 10, nBuckets = 4)
      .collect().map(_.toString).toSet
    val fromRaw = Bm25.topK(docs.filter(col("doc_id") < 600), queries, k = 10)
      .collect().map(_.toString).toSet
    assert(got === fromRaw)
  }

  test("post-ingest compaction of the partitioned postings leaves queries identical") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_bm25_compact")
    val idx = tmp.resolve("idx").toString
    // several small appends -> many small files per pbucket partition
    Bm25.writeBm25Index(docs.filter(col("doc_id") < 100), idx, nBuckets = 4)
    (1 to 4).foreach { i =>
      Bm25.appendBm25Index(
        docs.filter(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100),
        idx, nBuckets = 4)
    }
    val queries = docs.filter(col("doc_id") < 3)
    val before = Bm25.topKAgainstIndex(queries, idx, k = 10, nBuckets = 4)
      .collect().map(_.toString).toSet
    val (nb, na) = graft.ops.Compaction.compactPartitionedDir(
      spark, s"$idx/postings", targetBytes = 8L * 1024 * 1024)
    assert(nb > na, s"postings should compact ($nb -> $na)")
    val (db, da) = graft.ops.Compaction.compactPartitionedDir(
      spark, s"$idx/dfreq", targetBytes = 8L * 1024 * 1024)
    assert(db > da, s"dfreq should compact ($db -> $da)")
    val after = Bm25.topKAgainstIndex(queries, idx, k = 10, nBuckets = 4)
      .collect().map(_.toString).toSet
    assert(after === before)
  }
}
