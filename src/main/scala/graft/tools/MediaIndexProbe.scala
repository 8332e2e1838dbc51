package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak probe for the STORED simhash index ([[graft.dedup.NearDup
  * .writeSimHashIndex]]) — the receipt behind MediaIngest.startSteady's
  * claim that an indexed hash history beats the flat form's per-batch
  * full re-read + re-block. Synthetic 64-bit hashes stand in for the
  * decoded media keys (the index layer never sees pixels; decode rates
  * are MediaHashProbe's receipt), sized H and 10H, probed by the same
  * fixed small batch:
  *
  *   - flat:    [[NearDup.simHashNearDupsAgainstCorpus]] — what every
  *              micro-batch of the non-indexed loop pays: read ALL
  *              stored hashes, explode ×(radius+1) block keys, shuffle.
  *   - indexed: [[NearDup.simHashNearDupsAgainstIndex]] — pre-blocked
  *              postings read back partition-pruned to the pkeys the
  *              batch touches.
  *
  * Pairs must agree exactly (same blocking law); the honest scale story
  * is the ratio AND its growth: the flat form re-pays O(history)
  * staging per batch forever, the indexed form reads the touched slice.
  *
  * usage: MediaIndexProbe [nHistory] [nBatch] [parts]
  */
object MediaIndexProbe {
  def main(args: Array[String]): Unit = {
    val nHistory = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nBatch = args.drop(1).headOption.map(_.toInt).getOrElse(200)
    val parts = args.drop(2).headOption.map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "128"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    // deterministic pseudo-random 64-bit hashes; a planted twin every
    // 1000 ids (id and id+1 differ in 2 bits) keeps the pair set nonempty
    def hashes(n: Long, idOffset: Long) =
      spark.range(n).select((col("id") + idOffset).as("id"),
        when(col("id") % 1000 === 1,
            xxhash64(col("id") - 1).bitwiseXOR(lit(3L)))
          .otherwise(xxhash64(col("id"))).as("simhash"))

    val tmp = java.nio.file.Files.createTempDirectory("media_idx_probe")
    val batch = hashes(nBatch.toLong, 5000000000L).localCheckpoint()

    for (scale <- Seq(1L, 10L)) {
      val h = nHistory * scale
      val hist = hashes(h, 0L).localCheckpoint()
      val idx = tmp.resolve(s"idx_$scale").toString
      timed(s"build_index_${scale}x (once)") {
        graft.dedup.NearDup.writeSimHashIndex(hist, idx, maxHamming = 3, parts = parts)
        h
      }
      var flatPairs = 0L
      var idxPairs = 0L
      timed(s"flat_probe_${scale}x (per batch)") {
        flatPairs = graft.dedup.NearDup
          .simHashNearDupsAgainstCorpus(batch, hist, maxHamming = 3).count()
        flatPairs
      }
      timed(s"indexed_probe_${scale}x (per batch)") {
        idxPairs = graft.dedup.NearDup
          .simHashNearDupsAgainstIndex(batch, idx).count()
        idxPairs
      }
      require(flatPairs == idxPairs,
        s"indexed probe must equal flat probe: $idxPairs vs $flatPairs")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    spark.stop()
  }
}
