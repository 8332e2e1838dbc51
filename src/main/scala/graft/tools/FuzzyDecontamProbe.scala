package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.Decontaminate

/** Steady-state-vs-from-raw soak for the indexed fuzzy-decontam loop
  * ([[graft.text.Decontaminate.writeBenchIndex]] family). Readings:
  *
  *   1. from_raw — flagNearContaminated (both sides pay signatures);
  *   2. build    — writeBenchIndex (the once-per-benchmark cost);
  *   3. steady   — flagNearContaminatedAgainstIndex on the stored
  *                 index (what every batch pays), cold then warm.
  *
  * The claim being checked: steady pays only the BATCH side's
  * signature pass — the bench side's shingle-md5 work (the dominant
  * cost of the operator) comes off disk. On the soak fixture the
  * "benchmark" side is the corpus remainder (doc_id ≥ split — huge,
  * inverting production shape), which makes the saving it measures the
  * CONSERVATIVE upper-bound shape: a real benchmark is tiny and the
  * split even cheaper.
  *
  * usage: FuzzyDecontamProbe <sfDir> [split] [threshold]
  */
object FuzzyDecontamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val split = args.drop(1).headOption.map(_.toLong).getOrElse(450L)
    val threshold = args.drop(2).headOption.map(_.toDouble).getOrElse(0.9)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "128"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val train = docs.filter(col("doc_id") < split)
    val bench = docs.filter(col("doc_id") >= split)
    val idx = java.nio.file.Files.createTempDirectory("fz_probe")
      .resolve("idx").toString

    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[probe] $label%-9s wall=${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    docs.count() // warmup scan
    timed("from_raw") {
      Decontaminate.flagNearContaminated(train, bench, "doc_id", "text",
        threshold = threshold).count()
    }
    timed("build") { Decontaminate.writeBenchIndex(bench, "doc_id", "text", idx); 0L }
    timed("steady") {
      Decontaminate.flagNearContaminatedAgainstIndex(train, idx, "doc_id", "text",
        threshold = threshold).count()
    }
    timed("steady2") {
      Decontaminate.flagNearContaminatedAgainstIndex(train, idx, "doc_id", "text",
        threshold = threshold).count()
    }
    // the honest floor the steady claim compares against: the BATCH
    // side's signature + band pass alone (no index read, no joins) —
    // "steady ≈ sig_floor" is the production-shape receipt
    timed("sig_floor") {
      val pref = train.select(
        concat(lit("t:"), col("doc_id").cast("string")).as("id"), col("text"))
      graft.dedup.NearDup.bandRows(
        graft.dedup.NearDup.signatures(pref, "id", "text", 16), 16, 1).count()
    }
    spark.stop()
  }
}
