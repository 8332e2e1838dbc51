package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world"), (2L, "spark multimodal payload")).toDF("doc_id", "text")

  test("withBinaryPayload: binary column + typed metadata") {
    val b = Multimodal.withBinaryPayload(docs, "text")
    assert(b.schema("payload").dataType.typeName === "binary")
    val m = b.select($"media_meta.n_bytes", $"media_meta.digest").head()
    assert(m.getInt(0) === 11)
    assert(m.getString(1).length === 32)
  }

  test("extractFeatures: mapPartitions decode stub — fixed shape, deterministic") {
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.withBinaryPayload(docs, "text")).collect()
    assert(feats.length === 2)
    feats.foreach { f =>
      assert(f.features.length === 8)
      assert(f.features.forall(v => v >= -1f && v <= 1f))
    }
    // deterministic across runs (and hence across executors/partitions)
    val again = Multimodal.extractFeatures(spark,
      Multimodal.withBinaryPayload(docs, "text")).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.features.sameElements(b.features) && a.n_bytes == b.n_bytes })
  }

  test("sampleFrames: byte-range frame sampling with stride") {
    val framed = Multimodal.sampleFrames(
      Multimodal.withBinaryPayload(docs, "text"), "payload", frameBytes = 4, stride = 2)
    val r = framed.filter($"doc_id" === 2).select($"n_frames_sampled").head()
    // payload len 24 → 6 frames of 4 bytes → stride 2 keeps frames 0,2,4
    assert(r.getInt(0) === 3)
  }
}
