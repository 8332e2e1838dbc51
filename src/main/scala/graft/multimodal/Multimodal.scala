package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract plumbing
  * a training-data pipeline hangs off them.
  *
  * The Spark-side machinery here is real and tested — schema, batch
  * iteration shape, partitioning — while the actual media decoding is a
  * clearly-marked deterministic STUB (no image/audio codecs exist in this
  * environment). Swapping [[decodeStub]] for a real decoder (JNI codec,
  * ONNX session, etc.) changes no plumbing: decode runs via
  * `mapPartitions`, so any per-partition native resource is initialized
  * once per task, not once per row — the property that matters when each
  * partition holds thousands of images on a 1000-executor cluster.
  */
object Multimodal {

  /** A decoded media batch row: fixed-width feature vector + metadata. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, format: String,
                           width: Int, height: Int, features: Array[Float])

  /** Attach a binary payload column + metadata struct to a table. In
    * production the binary arrives from the lake; here we materialize one
    * from text so the downstream plumbing is exercised end-to-end.
    */
  def withBinaryPayload(df: DataFrame, srcCol: String): DataFrame =
    df.withColumn("payload", encode(col(srcCol), "UTF-8"))
      .withColumn("media_meta", struct(
        length(col("payload")).as("n_bytes"),
        lit("application/octet-stream").as("mime"),
        md5(col("payload")).as("digest")))

  /** ==== STUB ====
    * Deterministic fake decoder standing in for a real image/audio codec.
    * Consumes raw bytes, emits fixed-shape features. The real
    * implementation would decode pixels / PCM frames here; everything
    * around this function (schema, batching, partitioning) is production
    * plumbing.
    */
  private[multimodal] def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    // fake "dimensions" + a 8-dim "embedding" derived deterministically
    // from byte content — stable across runs, partitions and executors.
    val h = bytes.foldLeft(1469598103934665603L)((acc, b) => (acc ^ b) * 1099511628211L)
    val feats = Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xff).toFloat - 128f) / 128f)
    MediaFeatures(id, n, "stub", width = (h & 0x3ff).toInt, height = ((h >>> 10) & 0x3ff).toInt, feats)
  }

  /** Decode/feature-extract over the binary column. `mapPartitions` is the
    * deliberate shape: per-task decoder init happens once, rows stream
    * through without materializing the partition, and the output is a
    * typed Dataset with a fixed feature width.
    */
  def extractFeatures(spark: SparkSession, df: DataFrame,
                      idCol: String = "doc_id",
                      payloadCol: String = "payload"): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real decoder: initialize codec/session HERE, once per partition
        rows.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Frame-sampling plumbing for video-like payloads: split a payload into
    * fixed-size "frames" and keep every `stride`-th — pure expressions, no
    * decode, demonstrating byte-range sampling pushdown-style access.
    */
  def sampleFrames(df: DataFrame, payloadCol: String, frameBytes: Int,
                   stride: Int): DataFrame = {
    val nFrames = ceil(length(col(payloadCol)) / frameBytes.toDouble).cast(IntegerType)
    val sampled = transform(
      sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
      i => substring(col(payloadCol), i * frameBytes + 1, lit(frameBytes)))
    // a zero-byte payload (failed upstream fetch) has zero frames, not one
    // empty frame
    df.withColumn("frames",
        when(nFrames > 0, sampled).otherwise(array().cast("array<binary>")))
      .withColumn("n_frames_sampled", size(col("frames")))
  }
}
