package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDup

class NearDupIndexSpec extends SparkTestBase {

  test("against-index == against-raw-corpus; append picks up new history") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = docs.filter(col("doc_id") < 150)
    val seen1 = docs.filter(col("doc_id") >= 150 && col("doc_id") < 500)
    val seen2 = docs.filter(col("doc_id") >= 500 && col("doc_id") < 800)

    val tmp = java.nio.file.Files.createTempDirectory("neardup_index_spec")
    val idxPath = tmp.resolve("idx").toString
    NearDup.writeNearDupIndex(seen1, "doc_id", "text", numHashes = 16, idxPath)

    val viaIndex = NearDup.minHashLshAgainstIndex(
        batch, spark.read.parquet(idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    val viaRaw = NearDup.minHashLshAgainstCorpus(
        batch, seen1, "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(viaIndex === viaRaw, "stored index must reproduce the from-raw result")
    assert(viaIndex.nonEmpty, "fixture should contain cross near-dups")

    // append the second history slice; the union index must equal the
    // from-raw run against the combined corpus
    NearDup.appendNearDupIndex(seen2, "doc_id", "text", numHashes = 16, idxPath)
    val viaAppended = NearDup.minHashLshAgainstIndex(
        batch, spark.read.parquet(idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    val viaBoth = NearDup.minHashLshAgainstCorpus(
        batch, seen1.unionByName(seen2), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(viaAppended === viaBoth, "appended index must cover the grown corpus")
    assert(viaAppended.size > viaIndex.size || viaAppended === viaIndex,
      "growing history can only add pairs")

    // the stream-shape handle (open once, probe per batch) must equal
    // the path probe on the same live index
    val handle = NearDup.openNearDupIndex(spark, idxPath, bands = 4, rowsPerBand = 4)
    val viaHandle = NearDup.minHashLshAgainstHandle(
        batch, handle, "doc_id", "text", threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(viaHandle === viaAppended, "handle probe must equal the path probe")
  }

  test("index compaction: file count drops, query results identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = docs.filter(col("doc_id") < 150)
    val tmp = java.nio.file.Files.createTempDirectory("neardup_index_compact")
    val idxPath = tmp.resolve("idx").toString
    // simulate a long-running ingest: many small appended batches
    NearDup.writeNearDupIndex(
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 300),
      "doc_id", "text", numHashes = 16, idxPath)
    (3 to 7).foreach { i =>
      NearDup.appendNearDupIndex(
        docs.filter(col("doc_id") >= i * 100 && col("doc_id") < (i + 1) * 100),
        "doc_id", "text", numHashes = 16, idxPath)
    }
    val beforeRows = spark.read.parquet(idxPath).collect()
      .map(_.toString).sorted.toSeq
    val beforePairs = NearDup.minHashLshAgainstIndex(
        batch, spark.read.parquet(idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(beforePairs.nonEmpty)
    val (nBefore, nAfter) = graft.ops.Compaction.compactParquetDir(
      spark, idxPath, targetBytes = 512L * 1024)
    assert(nBefore > nAfter, s"compaction must shrink the file count ($nBefore -> $nAfter)")
    // every row survives, nothing duplicated
    val afterRows = spark.read.parquet(idxPath).collect()
      .map(_.toString).sorted.toSeq
    assert(afterRows === beforeRows)
    // the query sees the identical index
    val afterPairs = NearDup.minHashLshAgainstIndex(
        batch, spark.read.parquet(idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(afterPairs === beforePairs)
    // idempotent: a second pass on an already-compacted dir is a no-op
    val (n2Before, n2After) = graft.ops.Compaction.compactParquetDir(
      spark, idxPath, targetBytes = 512L * 1024)
    assert(n2Before === nAfter && n2After === nAfter)
  }

  test("delete: tombstoned docs vanish from results; idempotent; read-path equivalence") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = docs.filter(col("doc_id") < 150)
    val seen = docs.filter(col("doc_id") >= 150 && col("doc_id") < 800)
    val live = docs.filter(col("doc_id") >= 150 && col("doc_id") < 800)
      .filter(!(col("doc_id") >= 300 && col("doc_id") < 500))

    val tmp = java.nio.file.Files.createTempDirectory("neardup_index_erase")
    val idxPath = tmp.resolve("idx").toString
    NearDup.writeNearDupIndex(seen, "doc_id", "text", numHashes = 16, idxPath)

    // before any delete, the tombstone-aware read path is a plain read
    val plain = NearDup.minHashLshAgainstIndex(
        batch, spark.read.parquet(idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    val viaReader = NearDup.minHashLshAgainstIndex(
        batch, NearDup.readNearDupIndex(spark, idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(viaReader === plain, "read path must be identity before any delete")

    NearDup.deleteFromNearDupIndex(
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 500).select(col("doc_id")),
      idxPath, "doc_id")
    val afterDelete = NearDup.minHashLshAgainstIndex(
        batch, NearDup.readNearDupIndex(spark, idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    val fromLiveRaw = NearDup.minHashLshAgainstCorpus(
        batch, live, "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(afterDelete === fromLiveRaw,
      "erased index must equal the from-raw run on the live slice")
    assert(afterDelete.size < plain.size,
      "the fixture's dup structure should lose pairs when half the seen side is erased")
    assert(!afterDelete.exists { r =>
      val sid = r.getLong(r.fieldIndex("seen_id")); sid >= 300 && sid < 500
    }, "no tombstoned id may surface as a pair")

    // idempotent: deleting the same ids again changes nothing
    NearDup.deleteFromNearDupIndex(
      docs.filter(col("doc_id") >= 300 && col("doc_id") < 500).select(col("doc_id")),
      idxPath, "doc_id")
    val again = NearDup.minHashLshAgainstIndex(
        batch, NearDup.readNearDupIndex(spark, idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .orderBy("new_id", "seen_id").collect().toSeq
    assert(again === afterDelete)

    // the index table itself is untouched (tombstones live in the sibling
    // dir) — a rebuild-free erase by construction
    assert(spark.read.parquet(idxPath).count() === seen.count())
  }

  test("delete works for STRING ids (tombstones keep the index id type)") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 300)
      .select(concat(lit("doc-"), col("doc_id")).as("doc_id"), col("text"))
    // the batch re-submits verbatim copies of indexed docs under new
    // string ids — guaranteed near-dups of their seen originals
    val batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 3)
      .select(concat(lit("copy-"), col("doc_id")).as("doc_id"), col("text"))
    val tmp = java.nio.file.Files.createTempDirectory("neardup_idx_strid")
    val idxPath = tmp.resolve("idx").toString
    NearDup.writeNearDupIndex(docs, "doc_id", "text", numHashes = 16, idxPath)
    val before = NearDup.minHashLshAgainstIndex(
        batch, NearDup.readNearDupIndex(spark, idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .select("seen_id").as[String].collect().toSet
    assert(before.nonEmpty, "fixture must produce at least one near-dup pair")
    // a long-typed tombstone would NULL-cast 'doc-N' and silently no-op
    NearDup.deleteFromNearDupIndex(
      before.toSeq.toDF("doc_id"), idxPath, "doc_id")
    val after = NearDup.minHashLshAgainstIndex(
        batch, NearDup.readNearDupIndex(spark, idxPath), "doc_id", "text",
        bands = 4, rowsPerBand = 4, threshold = 0.7)
      .select("seen_id").as[String].collect().toSet
    assert(after.intersect(before).isEmpty,
      s"tombstoned string ids must vanish, still saw ${after.intersect(before)}")
  }

  test("index stores no text: schema is (id, sig, toks) only") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 50)
    val idx = NearDup.nearDupIndex(docs, "doc_id", "text", numHashes = 16)
    assert(idx.columns.toSeq === Seq("id", "sig", "toks"))
    assert(idx.count() === 50)
  }
}
