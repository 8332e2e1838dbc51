package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans of selected queries so plan
  * regressions (lost pushdown, extra exchanges, missed broadcast) are
  * visible. Run: sbt "runMain graft.tools.ExplainAudit [queryName...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_s1_scan_filter", "q_join_revenue_by_segment",
        "q_w5_rolling_stats", "q_pipeline_refined", "q_agg_groupby")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
