package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.MediaIngest

class MediaIngestSpec extends SparkTestBase {

  test("streamed pairs == all-corpus batch pairs, split-invariant, exactly-once") {
    import spark.implicits._
    // seeds mod 7 -> planted duplicate images across the feed
    val docs = (0L until 60L)
      .map(id => (id, Multimodal.makeBmp(16, 16, id % 7)))
      .toDF("doc_id", "payload")

    // ground truth: all near-dup pairs over the full corpus in one shot
    val hashes = Multimodal.imageAHashes(spark, docs)
      .select(col("doc_id").as("id"), col("ahash").as("simhash"))
    val want = graft.dedup.NearDup.simHashNearDups(hashes, maxHamming = 2)
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty, "fixture must contain near-dup pairs")

    val tmp = java.nio.file.Files.createTempDirectory("media_ingest_spec")
    val srcDir = tmp.resolve("src").toString
    docs.repartition(5).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = MediaIngest.start(spark, stream,
      tmp.resolve("hashes").toString, tmp.resolve("pairs").toString,
      tmp.resolve("ckpt").toString, maxHamming = 2)
    q.awaitTermination()

    val got = spark.read.parquet(tmp.resolve("pairs").toString)
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want,
      "union of per-batch pair emissions must equal the one-shot pair set")

    // the hash table accumulated every decodable doc exactly once
    val stored = spark.read.parquet(tmp.resolve("hashes").toString)
    assert(stored.select("doc_id").distinct().count() === 60)
    assert(stored.count() === 60, "one hash row per doc, no double-admits")

    // retry: replaying a batch overwrites its own partitions on BOTH tables
    val b0 = docs.filter(col("doc_id") < 12)
    MediaIngest.writeBatch(b0, 0L, tmp.resolve("h2").toString,
      tmp.resolve("p2").toString, 2, "doc_id", "payload")
    val oncePairs = spark.read.parquet(tmp.resolve("p2").toString).count()
    val onceHashes = spark.read.parquet(tmp.resolve("h2").toString).count()
    MediaIngest.writeBatch(b0, 0L, tmp.resolve("h2").toString,
      tmp.resolve("p2").toString, 2, "doc_id", "payload")
    assert(spark.read.parquet(tmp.resolve("p2").toString).count() === oncePairs)
    assert(spark.read.parquet(tmp.resolve("h2").toString).count() === onceHashes)
    // and crucially: the retry did NOT pair the batch against its own
    // crashed-attempt rows (batch_id < current pin) — every pair is in-batch
    val inBatchOnly = graft.dedup.NearDup.simHashNearDups(
      Multimodal.imageAHashes(spark, b0)
        .select(col("doc_id").as("id"), col("ahash").as("simhash")),
      maxHamming = 2).count()
    assert(oncePairs === inBatchOnly)

    // non-decodable payloads flow through without rows or failures
    val junk = Seq((999L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload")
    MediaIngest.writeBatch(junk, 7L, tmp.resolve("h2").toString,
      tmp.resolve("p2").toString, 2, "doc_id", "payload")
    assert(spark.read.parquet(tmp.resolve("h2").toString)
      .filter(col("doc_id") === 999L).count() === 0)
  }

  test("audio kind: streamed fingerprint pairs == one-shot pair set; unknown kind rejected") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(id => (id, Multimodal.makeWav(130, 1, 8000, id % 5)))
      .toDF("doc_id", "payload")
    val fps = Multimodal.audioFingerprints(spark, docs)
      .select(col("doc_id").as("id"), col("afp").as("simhash"))
    val want = graft.dedup.NearDup.simHashNearDups(fps, maxHamming = 2)
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty, "fixture must contain duplicate recordings")
    val tmp = java.nio.file.Files.createTempDirectory("media_ingest_audio")
    val srcDir = tmp.resolve("src").toString
    docs.repartition(4).write.parquet(srcDir)
    val stream = spark.readStream.schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    MediaIngest.start(spark, stream,
      tmp.resolve("hashes").toString, tmp.resolve("pairs").toString,
      tmp.resolve("ckpt").toString, maxHamming = 2, kind = "audio")
      .awaitTermination()
    val got = spark.read.parquet(tmp.resolve("pairs").toString)
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
    // the fingerprint table uses the audio column name
    assert(spark.read.parquet(tmp.resolve("hashes").toString)
      .columns.contains("afp"))
    val e = intercept[IllegalArgumentException] {
      MediaIngest.writeBatch(docs, 0L, tmp.resolve("h3").toString,
        tmp.resolve("p3").toString, 2, "doc_id", "payload", kind = "video")
    }
    assert(e.getMessage.contains("unknown media kind"))
  }

  test("startSteady (indexed history) emits the identical pair stream; probes prune") {
    import spark.implicits._
    val docs = (0L until 60L)
      .map(id => (id, Multimodal.makeBmp(16, 16, id % 7)))
      .toDF("doc_id", "payload")
    val hashes = Multimodal.imageAHashes(spark, docs)
      .select(col("doc_id").as("id"), col("ahash").as("simhash"))
    val want = graft.dedup.NearDup.simHashNearDups(hashes, maxHamming = 2)
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val tmp = java.nio.file.Files.createTempDirectory("media_ingest_steady")
    val srcDir = tmp.resolve("src").toString
    docs.repartition(5).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val idx = tmp.resolve("idx").toString
    MediaIngest.startSteady(spark, stream, idx,
      tmp.resolve("pairs").toString, tmp.resolve("ckpt").toString,
      maxHamming = 2).awaitTermination()
    val got = spark.read.parquet(tmp.resolve("pairs").toString)
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want, "indexed-history steady loop must equal the flat-history loop")

    // the index accumulated one posting set per doc (3 blocks at radius 2)
    val post = spark.read.parquet(s"$idx/post")
    assert(post.select("id").distinct().count() === 60)
    assert(post.count() === 60 * 3)

    // a small probe's pkey list must reach the store as a partition filter
    val probe = graft.dedup.NearDup.simHashNearDupsAgainstIndex(
      hashes.filter(col("id") < 3), idx)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && !p.contains("PartitionFilters: []"),
      s"expected a non-empty PartitionFilters on the index read:\n$p")

    // retry: replaying a batch replaces its own partitions on both stores
    // and must not pair the batch against its crashed-attempt postings
    val b0 = docs.filter(col("doc_id") < 12)
    MediaIngest.writeBatchSteady(b0, 0L, idx,
      tmp.resolve("p2").toString, "doc_id", "payload")
    val once = spark.read.parquet(tmp.resolve("p2").toString).count()
    val oncePost = spark.read.parquet(s"$idx/post").count()
    MediaIngest.writeBatchSteady(b0, 0L, idx,
      tmp.resolve("p2").toString, "doc_id", "payload")
    assert(spark.read.parquet(tmp.resolve("p2").toString).count() === once)
    assert(spark.read.parquet(s"$idx/post").count() === oncePost)
  }

  test("postings compaction: folded index is probe-identical and the segment pile stays bounded") {
    import spark.implicits._
    val docs = (0L until 60L)
      .map(id => (id, Multimodal.makeBmp(16, 16, id % 7)))
      .toDF("doc_id", "payload")
    val hashes = Multimodal.imageAHashes(spark, docs)
      .select(col("doc_id").as("id"), col("ahash").as("simhash"))
    val want = graft.dedup.NearDup.simHashNearDups(hashes, maxHamming = 2)
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    def segDirs(idx: String): Seq[Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/post")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
        .map(_.getPath.getName.stripPrefix("batch_id=").toLong).sorted
    }
    def run(compactEvery: Int): (Seq[(Long, Long)], String) = {
      val tmp = java.nio.file.Files.createTempDirectory(s"media_compact_$compactEvery")
      val srcDir = tmp.resolve("src").toString
      docs.repartition(6).write.parquet(srcDir)
      val stream = spark.readStream.schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val idx = tmp.resolve("idx").toString
      MediaIngest.startSteady(spark, stream, idx,
        tmp.resolve("pairs").toString, tmp.resolve("ckpt").toString,
        maxHamming = 2, compactEvery = compactEvery).awaitTermination()
      val pairs = spark.read.parquet(tmp.resolve("pairs").toString)
        .select("id_a", "id_b").orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      (pairs, idx)
    }
    val (flatPairs, flatIdx) = run(0)
    val (foldPairs, foldIdx) = run(2)
    // identity is REQUIRED, not sampled: same pair stream either way
    assert(flatPairs === want && foldPairs === want)
    // the pile: 6 per-batch segments uncompacted vs fold + tail compacted
    assert(segDirs(flatIdx) === (0L until 6L))
    val folded = segDirs(foldIdx)
    assert(folded.count(_ <= -10L) === 1 && folded.count(_ >= 0) < 6,
      s"expected one fold segment and a bounded tail, got $folded")
    // no postings lost or invented by the fold
    assert(spark.read.parquet(s"$foldIdx/post").count() ===
      spark.read.parquet(s"$flatIdx/post").count())
    // a probe against the folded store equals the never-folded one
    def probe(idx: String) = graft.dedup.NearDup.simHashNearDupsAgainstIndex(
        hashes.filter(col("id") < 5), idx)
      .select("new_id", "seen_id").orderBy("new_id", "seen_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(probe(foldIdx) === probe(flatIdx))

    // base-build (-1) + appends fold too; a fold-only store no-ops
    val idx2 = java.nio.file.Files.createTempDirectory("media_compact_base")
      .resolve("idx").toString
    graft.dedup.NearDup.writeSimHashIndex(
      hashes.filter(col("id") < 30), idx2, maxHamming = 2)
    graft.dedup.NearDup.appendSimHashIndex(
      hashes.filter(col("id") >= 30 && col("id") < 45), idx2, 0L)
    graft.dedup.NearDup.appendSimHashIndex(
      hashes.filter(col("id") >= 45), idx2, 1L)
    assert(graft.dedup.NearDup.compactSimHashIndex(spark, idx2, upTo = 2L) === 3)
    assert(segDirs(idx2) === Seq(-11L))
    assert(probe(idx2) === probe(flatIdx))
    assert(graft.dedup.NearDup.compactSimHashIndex(spark, idx2, upTo = 2L) === 0,
      "a fold-only store must no-op, never self-fold")
  }

  test("MetaIngest: gate at arrival — split-invariant, retry-idempotent, edges exact") {
    import spark.implicits._
    import graft.streaming.MetaIngest
    // classes straddling every admission edge (minW=6, minH=5, 8 kHz)
    val docs = (0L until 50L).map { id =>
      val bytes = (id % 5) match {
        case 0 => Multimodal.makePng(4 + (id % 6).toInt, 8, id) // width sweep
        case 1 => Multimodal.makeWav(50, 1, if (id % 2 == 0) 4000 else 12000, id)
        case 2 => Multimodal.makeMp4Mjpeg(16, 16, id, 2)        // always kept
        case 3 => Multimodal.makeGifAnimated(4, 4, id, 2)       // always dropped
        case _ => Array.fill(12)(7.toByte)                      // unknown: dropped
      }
      (id, bytes)
    }.toDF("doc_id", "payload")
    val want = (0L until 50L).filter { id =>
      (id % 5 == 0 && id % 6 >= 2) || (id % 5 == 1 && id % 2 == 1) || id % 5 == 2
    }
    val tmp = java.nio.file.Files.createTempDirectory("meta_ingest_spec")
    val srcDir = tmp.resolve("src").toString
    docs.repartition(4).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = MetaIngest.start(spark, stream,
      tmp.resolve("meta").toString, tmp.resolve("kept").toString,
      tmp.resolve("ckpt").toString,
      minWidth = 6, minHeight = 5, minSampleRate = 8000)
    q.awaitTermination()
    val kept = spark.read.parquet(tmp.resolve("kept").toString)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq === want,
      "kept set must equal the closed-form admission set across any split")
    // the full metadata table holds EVERY doc once, admitted or not
    val meta = spark.read.parquet(tmp.resolve("meta").toString)
    assert(meta.count() === 50L)
    assert(meta.select("doc_id").distinct().count() === 50L)
    // retry idempotency: re-running a batch id must not duplicate rows
    // partition-column batch_id reads back as int32
    val lastBatch = meta.agg(max(col("batch_id"))).head.get(0)
      .asInstanceOf[Number].longValue
    val replay = meta.filter(col("batch_id") === lastBatch)
      .select("doc_id").as[Long].collect().toSet
    MetaIngest.writeBatch(
      docs.filter(col("doc_id").isin(replay.toSeq.map(Long.box): _*)), lastBatch,
      tmp.resolve("meta").toString, tmp.resolve("kept").toString,
      minWidth = 6, minHeight = 5, minSampleRate = 8000,
      idCol = "doc_id", payloadCol = "payload")
    val after = spark.read.parquet(tmp.resolve("meta").toString)
    assert(after.count() === 50L, "a retried batch must overwrite, not append")
    assert(spark.read.parquet(tmp.resolve("kept").toString)
      .select("doc_id").as[Long].collect().sorted.toSeq === want)
  }
}
