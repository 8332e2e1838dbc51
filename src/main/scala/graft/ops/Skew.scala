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

  /** Two-stage salted aggregation: repartition pressure on a hot group key
    * is spread across `saltBuckets` sub-keys, partially aggregated, then
    * merged. Works for any algebraic aggregate (sum/count/min/max) — the
    * caller supplies both the partial and the merge expression.
    *
    * sum over (key, salt) → sum over key: associativity makes the result
    * identical to a direct groupBy; only the shuffle distribution changes.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted join for a skewed fact ⋈ small-ish dim that exceeds broadcast
    * limits: fact rows get a random salt in [0, n); the dim side is
    * replicated n times with each salt value, so one hot key's rows spread
    * over n reducers instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(saltBuckets)))
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
