package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for 100 TB-scale shuffles.
  *
  * AQE's skew-join splitting handles moderate skew automatically; these
  * operators cover the cases it can't: a single hot aggregation key whose
  * partial state is itself huge, and a broadcast-ineligible join against a
  * skewed fact side.
  */
object Skew {

  /** Deterministic salt in [0, n): content hash over every column, so
    * re-runs and resumes distribute rows identically at any input layout
    * (unlike `monotonically_increasing_id`, which is partition-dependent).
    * Caveat: byte-identical duplicate rows share a salt — for corpora that
    * are mostly exact duplicates of ONE row, dedup first.
    */
  private def contentSalt(df: DataFrame, saltBuckets: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(saltBuckets.toLong))

  /** Two-stage salted aggregation: repartition pressure on a hot group key
    * is spread across `saltBuckets` sub-keys, partially aggregated, then
    * merged. Works for any algebraic aggregate — the caller supplies the
    * partial and the merge aggregate (they differ for e.g. count: partial
    * `count`, merge `sum`).
    *
    * partial over (key, salt) → merge over key: associativity makes the
    * result identical to a direct groupBy; only the shuffle distribution
    * changes.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String,
                partial: Column => Column, merge: Column => Column,
                outName: String, saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", contentSalt(df, saltBuckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(merge(col("__partial")).as(outName))

  /** [[saltedAgg]] specialized to sum (partial = merge = sum). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keys, valueCol, sum, sum, s"sum_$valueCol", saltBuckets)

  /** Salted join for a skewed fact ⋈ small-ish dim that exceeds broadcast
    * limits: fact rows get a deterministic content-hash salt in [0, n); the
    * dim side is replicated n times with each salt value, so one hot key's
    * rows spread over n reducers instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt", contentSalt(fact, saltBuckets))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Diagnostic: per-key row counts for the heaviest keys — run before
    * picking a partitioning/bucketing strategy.
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*).count().orderBy(col("count").desc).limit(topN)
}
