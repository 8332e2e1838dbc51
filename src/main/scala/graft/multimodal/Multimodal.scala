package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract plumbing
  * a training-data pipeline hangs off them.
  *
  * The Spark-side machinery here is real and tested — schema, batch
  * iteration shape, partitioning. Decoding is real for BMP ([[parseBmp]]:
  * pure-JVM header parse + pixel walk, no codec library needed); other
  * formats route to a clearly-marked deterministic STUB (no image/audio
  * codecs exist in this environment). Swapping [[decodeStub]] for a real
  * decoder (JNI codec, ONNX session, etc.) changes no plumbing: decode
  * runs via `mapPartitions`, so any per-partition native resource is
  * initialized once per task, not once per row — the property that
  * matters when each partition holds thousands of images on a
  * 1000-executor cluster.
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

  // ---- real decoder: BMP (Windows bitmap, public spec) ----------------
  // One format is de-stubbed with public knowledge only: uncompressed
  // 24-bpp BI_RGB bitmaps are a fixed-layout header + raw pixel rows, so
  // a header parse + pixel walk needs zero codec libraries. Every other
  // format still routes to [[decodeStub]].

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Parse + decode an uncompressed 24-bpp BMP: BITMAPFILEHEADER (14
    * bytes: "BM", file size, pixel-array offset) then BITMAPINFOHEADER
    * (40 bytes: width, height — negative height = top-down row order —
    * planes, bpp, compression). Rows are 4-byte aligned; the walk skips
    * the padding and folds real pixel bytes into the feature vector:
    * per-channel means (BGR byte order on disk), overall mean, the
    * >127 byte fraction, and the aspect ratio split. Returns None for
    * anything that is not a well-formed 24-bpp BI_RGB bitmap (wrong
    * magic, truncated pixel array, compressed, paletted) — the caller
    * falls back to the stub rather than guessing.
    */
  def parseBmp(id: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes.length < 54 || bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte)
      return None
    val pixelOff = le32(bytes, 10)
    val dibSize = le32(bytes, 14)
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val planes = le16(bytes, 26)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    val h = math.abs(hRaw)
    // 1<<14 sanity bound: a lying header must not drive a 100 GB walk
    if (dibSize < 40 || planes != 1 || bpp != 24 || compression != 0 ||
        w <= 0 || h == 0 || w > (1 << 14) || h > (1 << 14))
      return None
    val stride = ((3 * w + 3) / 4) * 4
    if (pixelOff < 54 || pixelOff.toLong + stride.toLong * h > bytes.length)
      return None
    var sumB = 0L; var sumG = 0L; var sumR = 0L; var high = 0L
    var row = 0
    while (row < h) {
      val base = pixelOff + row * stride
      var x = 0
      while (x < w) {
        val b = bytes(base + 3 * x) & 0xff
        val g = bytes(base + 3 * x + 1) & 0xff
        val r = bytes(base + 3 * x + 2) & 0xff
        sumB += b; sumG += g; sumR += r
        high += (if (b > 127) 1 else 0) + (if (g > 127) 1 else 0) +
          (if (r > 127) 1 else 0)
        x += 1
      }
      row += 1
    }
    val n = w.toLong * h
    val feats = Array(
      (sumB.toDouble / (n * 255)).toFloat,
      (sumG.toDouble / (n * 255)).toFloat,
      (sumR.toDouble / (n * 255)).toFloat,
      ((sumB + sumG + sumR).toDouble / (3 * n * 255)).toFloat,
      (high.toDouble / (3 * n)).toFloat,
      w.toFloat / (w + h), h.toFloat / (w + h), 0f)
    Some(MediaFeatures(id, bytes.length, "bmp", w, h, feats))
  }

  /** Decode dispatch: real parse for the formats a pure-JVM reader can
    * own (BMP today), [[decodeStub]] for everything else.
    */
  def decode(id: Long, bytes: Array[Byte]): MediaFeatures =
    parseBmp(id, bytes).getOrElse(decodeStub(id, bytes))

  /** Fixture/test writer for the one de-stubbed format: a 24-bpp
    * bottom-up BI_RGB bitmap whose pixel bytes follow the deterministic
    * formula `(seed + row*31 + k*7) mod 256` (row = on-disk row index,
    * k = byte index within the row's pixel data) — so an oracle can
    * predict file size, dimensions, and any pixel statistic in closed
    * form. Layout per the public BMP spec: 14-byte file header,
    * 40-byte info header, 4-byte-aligned rows.
    */
  def makeBmp(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 1024 && h <= 1024, s"fixture dims $w x $h")
    val stride = ((3 * w + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    putLe32(2, size); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, w); putLe32(22, h)
    out(26) = 1; out(28) = 24
    putLe32(34, stride * h)
    var row = 0
    while (row < h) {
      var k = 0
      while (k < 3 * w) { // padding bytes stay zero
        out(54 + row * stride + k) = ((seed + row * 31L + k * 7L) % 256).toByte
        k += 1
      }
      row += 1
    }
    out
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
        // real decoder init happens HERE, once per partition; BMP needs
        // none, other formats' codecs would
        rows.map { case (id, bytes) => decode(id, bytes) }
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
