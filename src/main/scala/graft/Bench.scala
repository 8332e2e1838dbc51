package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle-partition override: at soak scale (≥10× sf0.1) partitions
    // sized `cpus` spill on the window-heavy queries; 4× cpus is the
    // documented fix (BASELINE.md). Defaults to cpus for the driver run.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // Comma-separated query-name filter for single-query investigation.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ShareWindowExchange + vec_dot active in the measured path
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Timing policy (BASELINE.md "Bench variance"): 1 untimed warmup pass
    // per query (JIT + code cache + parquet footer cache), then
    // median-of-`repeats` timed passes. Two identical-binary rounds
    // swung ±30% under the old min-of-2 — min keeps the single luckiest
    // run, so one quiet moment fakes a speedup and one GC spike is
    // invisible; the median of 3 warm runs is the statistic a regression
    // has to actually move.
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "1").toInt
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // noop sink: materializes every row/column of the result (unlike
      // count(), which lets the optimizer delete sorts and projections).
      // A failed query must NOT read as a near-zero "speedup": record -1
      // (clearly invalid) and shout on stderr.
      var failed = false
      def run(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (1 to warmups).foreach(_ => run())
      val times = (1 to repeats).map(_ => run()).sorted
      // upper median for even n: the conservative (pessimistic) pick
      name -> (if (failed) -1.0 else times(times.length / 2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum // failed (-1) excluded
    // policy fields recorded so round-over-round deltas are readable as
    // signal vs JVM noise (warmup + median-of-3 is the default).
    println(s"""{"metric":"total","value":$total,"unit":"sec","repeats":$repeats,"warmups":$warmups,"policy":"median","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
