package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Replicates a scale-factor directory `factor`× into a multi-file layout
  * for soak benchmarks (e.g. sf0.1 → an sf1-equivalent).
  *
  * Replication preserves the data's RELATIONAL shape instead of naively
  * stacking identical copies:
  *  - every key column (TPC-H-ish `*key` suffixes plus `event_id`/
  *    `user_id`/`doc_id`/`vec_id`) is shifted by `replica × 10¹²` — the
  *    same stride on both sides of every foreign key, so joins match
  *    within a replica and never across, and key cardinality scales with
  *    the data (windows/groupBys don't see artificially hot keys);
  *  - embedding vectors are cyclically rotated by the replica index
  *    (norm-preserving, direction-changing), so ANN/near-dup queries see
  *    10× genuinely distinct vectors rather than 10 exact copies of each
  *    (which would make bucketed candidate generation quadratic by
  *    construction and measure duplication, not the operator);
  *  - document text is intentionally replicated verbatim: 10× duplicated
  *    corpora are exactly what dedup operators face in production, so the
  *    dedup tier soaks against realistic duplication.
  *
  * Usage:
  *   sbt "runMain graft.tools.ScaleFixture /root/testdata/sf0.1 /tmp/sf1_soak 10 16"
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1_soak SPARK_GRAFT_CPUS=32 sbt "runMain graft.Bench"
  */
object ScaleFixture {
  private val keySuffixes = Seq("custkey", "orderkey", "partkey", "suppkey",
    "nationkey", "regionkey")
  private val keyExact = Set("event_id", "user_id", "doc_id", "vec_id")
  private val stride = 1000000000000L // same shift for every key → FKs survive

  private def isKey(name: String): Boolean =
    keyExact.contains(name) || keySuffixes.exists(s => name.endsWith(s))

  private def replica(df: DataFrame, r: Int, dim: Int): DataFrame = {
    val cols = df.columns.map {
      case "embedding" if r > 0 =>
        // rotate by r: element j takes value from (j + r) mod dim
        transform(sequence(lit(0), lit(dim - 1)),
          j => element_at(col("embedding"), (j + lit(r)) % dim + 1))
          .cast("array<float>").as("embedding")
      case c if isKey(c) && r > 0 => (col(c) + lit(r * stride)).as(c)
      case c => col(c)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleFixture <srcSfDir> <outDir> [factor] [nFiles]")
    val (src, out) = (args(0), args(1))
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val nFiles = args.drop(3).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", nFiles)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    MultiFileFixture.tables.foreach { name =>
      val base = spark.read.parquet(s"$src/$name.parquet")
      val dim =
        if (base.columns.contains("embedding")) base.select(size(col("embedding"))).head().getInt(0)
        else 0
      (0 until factor).map(replica(base, _, dim))
        .reduce(_ unionByName _)
        .repartition(nFiles)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    spark.stop()
  }
}
