package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (spark_guide.md: lazy val, local). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session

  /** Data-file count per LEAF partition directory of a (possibly
    * nested) `key=value`-partitioned parquet table — the write-fan-out
    * hygiene probe: a correctly `repartition(partitionCol)`-ed write
    * leaves ≈1 file per leaf, a naive one leaves tasks × leaves.
    */
  def leafFileCounts(dir: String): Map[String, Int] = {
    def walk(d: java.io.File, prefix: String): Seq[(String, Int)] = {
      val entries = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      val subParts = entries.filter(e => e.isDirectory && e.getName.contains("="))
      if (subParts.nonEmpty)
        subParts.flatMap(s => walk(s, s"$prefix${s.getName}/"))
      else {
        val n = entries.count(f => f.isFile && f.getName.startsWith("part-"))
        if (n > 0 || prefix.nonEmpty) Seq(prefix -> n) else Seq.empty
      }
    }
    walk(new java.io.File(dir), "").toMap
  }
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // tests run under the same extensions as Verify/Bench, so plan
      // asserts exercise the config that is actually measured
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
