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

  test("sampleFrames: zero-byte payload — Spark NULL digest ≡ oracle CASE NULL") {
    // the q_frame_sample oracle guards md5(substring(text,1,64)) with
    // CASE octet_length(text)=0 → NULL; this pins both sides of that
    // contract on an empty document so a fixture with one ever agrees
    val empty = Seq((1L, ""), (2L, "payload!")).toDF("doc_id", "text")
    val framed = Multimodal.sampleFrames(
      Multimodal.withBinaryPayload(empty, "text"), "payload", frameBytes = 64, stride = 2)
      .select($"doc_id", $"n_frames_sampled",
        md5(try_element_at($"frames", lit(1))).as("spark_digest"),
        // oracle replay (same expression the DuckDB side runs)
        when(octet_length($"text") === 0, lit(null))
          .otherwise(md5(substring($"text", 1, 64))).as("oracle_digest"))
      .orderBy("doc_id").collect()
    assert(framed(0).getInt(1) === 0)
    assert(framed(0).isNullAt(2) && framed(0).isNullAt(3), "empty doc: both sides NULL")
    assert(!framed(1).isNullAt(2) && framed(1).getString(2) === framed(1).getString(3),
      "non-empty doc: both sides same digest")
  }

  test("sampleFrames: byte-range frame sampling with stride") {
    val framed = Multimodal.sampleFrames(
      Multimodal.withBinaryPayload(docs, "text"), "payload", frameBytes = 4, stride = 2)
    val r = framed.filter($"doc_id" === 2).select($"n_frames_sampled").head()
    // payload len 24 → 6 frames of 4 bytes → stride 2 keeps frames 0,2,4
    assert(r.getInt(0) === 3)
  }
}
