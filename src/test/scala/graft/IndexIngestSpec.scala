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
