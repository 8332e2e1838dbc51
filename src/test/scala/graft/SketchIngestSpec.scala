package graft

import org.apache.spark.sql.functions._

import graft.ops.{Hll, QuantileSketch, TopKSketch}
import graft.streaming.SketchIngest

class SketchIngestSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val events = graft.ops.Tables
    .readEvents(spark, "/root/testdata/sf0.001")

  private def streamOf(path: String) = {
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema)
      .option("basePath", new java.io.File(path).getParent)
      .option("maxFilesPerTrigger", 1)
      .parquet(path + "*")
  }

  test("streamed quantile segments ≡ one-shot sketch (split-invariant by algebra)") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_qsk")
    val seg = tmp.resolve("seg").toString
    val q = SketchIngest.startQuantile(
      streamOf("/root/testdata/sf0.001/documents.parquet"),
      seg, tmp.resolve("ckpt").toString,
      Seq("source"), "n_chars", lo = 0L, hi = 4096L, nBins = 64)
    q.awaitTermination()
    val streamed = QuantileSketch.quantilesFromSegments(
      spark, seg, Seq("source"), Seq(500, 950), 0L, 4096L, 64)
      .orderBy("source", "q_pm").collect().toSeq
    val oneShot = QuantileSketch.quantileSketch(
      docs, Seq("source"), "n_chars", Seq(500, 950), 0L, 4096L, 64)
      .orderBy("source", "q_pm").collect().toSeq
    assert(streamed === oneShot)
    assert(streamed.nonEmpty)
  }

  test("streamed HLL segments ≡ one-shot estimate") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_hll")
    val seg = tmp.resolve("seg").toString
    // events parquet read via the NTZ-safe reader for the static side;
    // the stream side only touches event_id/user_id (no ts), so a plain
    // schema-pinned readStream is safe
    val q = SketchIngest.startHll(
      streamOf("/root/testdata/sf0.001/events.parquet")
        .select(col("event_id"), col("user_id")),
      seg, tmp.resolve("ckpt").toString, Seq.empty, "user_id")
    q.awaitTermination()
    val streamed = Hll.estimateFromSegments(spark, seg, Seq.empty)
      .select("v_zero", "t_scaled", "est_micro").collect().toSeq
    val oneShot = Hll.distinctSketch(
      events.select("event_id", "user_id"), Seq.empty, "user_id")
      .select("v_zero", "t_scaled", "est_micro").collect().toSeq
    assert(streamed === oneShot)
  }

  test("streamed top-k segments: bracket contains exact counts whatever the split") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_topk")
    val seg = tmp.resolve("seg").toString
    val q = SketchIngest.startTopK(
      streamOf("/root/testdata/sf0.001/events.parquet")
        .select(col("event_id"), col("user_id")),
      seg, tmp.resolve("ckpt").toString, Seq.empty, "user_id", k = 10)
    q.awaitTermination()
    val exact = events.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rep = TopKSketch.topKFromSegments(spark, seg, Seq.empty, topN = 10)
      .select("item", "cnt_lower", "cnt_upper")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rep.nonEmpty)
    rep.foreach { case (u, lo, hi) =>
      assert(lo <= exact(u) && exact(u) <= hi, s"user $u [$lo,$hi] vs ${exact(u)}")
    }
  }

  test("streamed KMV segments ≡ one-shot sketch; replayed batch idempotent") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_kmv")
    val seg = tmp.resolve("seg").toString
    val q = SketchIngest.startKmv(
      streamOf("/root/testdata/sf0.001/events.parquet")
        .select(col("event_type"), col("user_id")),
      seg, tmp.resolve("ckpt").toString, Seq("event_type"), "user_id", k = 16)
    q.awaitTermination()
    val streamed = graft.ops.Kmv.estimateFromSegments(
      spark, seg, Seq("event_type"), k = 16)
      .orderBy("event_type").collect().toSeq
    val oneShot = graft.ops.Kmv.distinctSketch(
      events.select("event_type", "user_id"), Seq("event_type"), "user_id", k = 16)
      .orderBy("event_type").collect().toSeq
    assert(streamed === oneShot)
    SketchIngest.appendKmvBatch(
      events.select("event_type", "user_id").filter(col("user_id") < 5),
      7L, Seq("event_type"), "user_id", 16, seg)
    SketchIngest.appendKmvBatch(
      events.select("event_type", "user_id").filter(col("user_id") < 5),
      7L, Seq("event_type"), "user_id", 16, seg)
    val after = graft.ops.Kmv.estimateFromSegments(
      spark, seg, Seq("event_type"), k = 16)
      .orderBy("event_type").collect().toSeq
    assert(after === oneShot) // the extra batch is a subset: sketch unchanged
  }

  test("streamed moment segments ≡ one-shot component (sum-merge split-invariant)") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_pca")
    val seg = tmp.resolve("seg").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // multi-file copy so several micro-batches append separate segments
    val multi = tmp.resolve("emb.parquet").toString
    emb.repartition(4).write.parquet(multi)
    val q = SketchIngest.startMoments(
      streamOf(multi).select(col("embedding")),
      seg, tmp.resolve("ckpt").toString, dim = 64)
    q.awaitTermination()
    val streamed = graft.similarity.Pca.componentFromMomentSegments(spark, seg, dim = 64)
    val oneShot = graft.similarity.Pca.topComponentFx(emb, dim = 64)
    assert(streamed === oneShot)
    // exactly-once: replaying one micro-batch's append leaves the
    // component unchanged (dynamic overwrite of its batch_id partition)
    SketchIngest.appendMomentBatch(emb.limit(0), 99L, 64, "embedding", seg)
    SketchIngest.appendMomentBatch(emb.filter(col("vec_id") < 10), 3L, 64, "embedding", seg)
    val once = graft.similarity.Pca.componentFromMomentSegments(spark, seg, dim = 64)
    SketchIngest.appendMomentBatch(emb.filter(col("vec_id") < 10), 3L, 64, "embedding", seg)
    val twice = graft.similarity.Pca.componentFromMomentSegments(spark, seg, dim = 64)
    assert(once === twice)
  }

  test("epoch drift straight off ingested moment segments, by batch_id range") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seg = java.nio.file.Files.createTempDirectory("drift_seg").resolve("seg").toString
    val epochA = emb.filter(col("vec_id") % 2 === 0)
    val epochB = emb.filter(col("vec_id") % 2 =!= 0)
    SketchIngest.appendMomentBatch(epochA, 0L, 64, "embedding", seg)
    SketchIngest.appendMomentBatch(epochB, 1L, 64, "embedding", seg)
    // the monitoring read: slice the ONE segment store by batch_id range
    // — no corpus re-scan, no second store
    val stored = spark.read.parquet(seg)
    val viaSegments = graft.similarity.Pca.embeddingDrift(
      stored.filter(col("batch_id") === 0L),
      stored.filter(col("batch_id") === 1L), dim = 64)
      .orderBy("pos").collect().toSeq
    val direct = graft.similarity.Pca.embeddingDrift(
      graft.similarity.Pca.momentSegment(epochA, dim = 64),
      graft.similarity.Pca.momentSegment(epochB, dim = 64), dim = 64)
      .orderBy("pos").collect().toSeq
    assert(viaSegments === direct)
    assert(viaSegments.nonEmpty)
  }

  test("STREAMED epoch drift: z table invariant to each epoch's micro-batch cut") {
    // both epochs arrive as multi-micro-batch STREAMS into ONE segment
    // table (epoch B at a disjoint batchIdOffset range); the drift read
    // slices by batch_id range and must equal the one-shot two-segment
    // computation — sum-merge algebra says the z table cannot see how
    // either feed was cut into batches
    val tmp = java.nio.file.Files.createTempDirectory("stream_drift")
    val seg = tmp.resolve("seg").toString
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val epochA = emb.filter(col("vec_id") % 2 === 0)
    val epochB = emb.filter(col("vec_id") % 2 =!= 0)
    // different file counts → different micro-batch cuts per epoch
    val multiA = tmp.resolve("a.parquet").toString
    val multiB = tmp.resolve("b.parquet").toString
    epochA.repartition(3).write.parquet(multiA)
    epochB.repartition(5).write.parquet(multiB)
    val off = 1L << 20
    SketchIngest.startMoments(streamOf(multiA).select(col("embedding")),
      seg, tmp.resolve("ckptA").toString, dim = 64).awaitTermination()
    SketchIngest.startMoments(streamOf(multiB).select(col("embedding")),
      seg, tmp.resolve("ckptB").toString, dim = 64, batchIdOffset = off)
      .awaitTermination()
    val stored = spark.read.parquet(seg)
    // several batches landed per epoch (the cut is real)
    val perEpoch = stored.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).partition(_ < off)
    assert(perEpoch._1.length >= 3 && perEpoch._2.length >= 5)
    val streamed = graft.similarity.Pca.embeddingDrift(
      stored.filter(col("batch_id") < off),
      stored.filter(col("batch_id") >= off), dim = 64)
      .orderBy("pos").collect().toSeq
    val oneShot = graft.similarity.Pca.embeddingDrift(
      graft.similarity.Pca.momentSegment(epochA, dim = 64),
      graft.similarity.Pca.momentSegment(epochB, dim = 64), dim = 64)
      .orderBy("pos").collect().toSeq
    assert(streamed === oneShot)
    assert(streamed.nonEmpty)
  }

  test("in-loop compaction folds quantile segments without changing answers") {
    val tmp = java.nio.file.Files.createTempDirectory("stream_qsk_fold")
    val seg = tmp.resolve("seg").toString
    // multi-file copy so AvailableNow + maxFilesPerTrigger=1 yields
    // several micro-batches (the single-file source is one batch and
    // nothing would fold)
    val multi = tmp.resolve("docs.parquet").toString
    docs.repartition(5).write.parquet(multi)
    val q = SketchIngest.startQuantile(
      streamOf(multi),
      seg, tmp.resolve("ckpt").toString,
      Seq("source"), "n_chars", lo = 0L, hi = 4096L, nBins = 64,
      compactEvery = 2)
    q.awaitTermination()
    val folded = QuantileSketch.quantilesFromSegments(
      spark, seg, Seq("source"), Seq(500, 950), 0L, 4096L, 64)
      .orderBy("source", "q_pm").collect().toSeq
    val oneShot = QuantileSketch.quantileSketch(
      docs, Seq("source"), "n_chars", Seq(500, 950), 0L, 4096L, 64)
      .orderBy("source", "q_pm").collect().toSeq
    assert(folded === oneShot)
    // folded partitions (batch_id=-10-x) exist and the per-batch count
    // is bounded by the cadence, not the batch count
    val dirs = new java.io.File(seg).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch_id="))
    assert(dirs.exists(_.startsWith("batch_id=-1")),
      s"expected a folded segment among ${dirs.toSeq}")
  }

  test("exactly-once: a replayed micro-batch replaces its own segment") {
    val tmp = java.nio.file.Files.createTempDirectory("retry_sketch")
    val qseg = tmp.resolve("qseg").toString
    val tseg = tmp.resolve("tseg").toString
    val half1 = docs.filter(col("doc_id") < 250)
    val half2 = docs.filter(col("doc_id") >= 250)
    SketchIngest.appendQuantileBatch(half1, 0L, Seq("source"), "n_chars", 0L, 4096L, 64, qseg)
    SketchIngest.appendQuantileBatch(half2, 1L, Seq("source"), "n_chars", 0L, 4096L, 64, qseg)
    SketchIngest.appendTopKBatch(events, 0L, Seq.empty, "user_id", 10, tseg)
    val qBefore = QuantileSketch.quantilesFromSegments(
      spark, qseg, Seq("source"), Seq(500), 0L, 4096L, 64)
      .orderBy("source").collect().toSeq
    val tBefore = TopKSketch.topKFromSegments(spark, tseg, Seq.empty, 10)
      .orderBy("item").collect().toSeq
    // sink-side crash replay: the same micro-batches run again
    SketchIngest.appendQuantileBatch(half2, 1L, Seq("source"), "n_chars", 0L, 4096L, 64, qseg)
    SketchIngest.appendTopKBatch(events, 0L, Seq.empty, "user_id", 10, tseg)
    val qAfter = QuantileSketch.quantilesFromSegments(
      spark, qseg, Seq("source"), Seq(500), 0L, 4096L, 64)
      .orderBy("source").collect().toSeq
    val tAfter = TopKSketch.topKFromSegments(spark, tseg, Seq.empty, 10)
      .orderBy("item").collect().toSeq
    assert(qAfter === qBefore)
    assert(tAfter === tBefore)
  }
}
