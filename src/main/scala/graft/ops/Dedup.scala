package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.4).
  *
  * Scale notes: both variants are one hash-partitioned shuffle on the dedup
  * key. [[dropExact]] shuffles on *all* columns (Spark rewrites
  * `dropDuplicates()` to a hash aggregate with map-side partial dedup, so
  * only surviving rows cross the wire). [[keepFirst]] shuffles on the key
  * columns only; skewed keys are the risk at 100 TB — AQE skew handling
  * plus a high-cardinality tie-break column keep partitions bounded.
  */
object Dedup {

  /** D1: full-row distinct (`etl/etl.py:49`, `etl/transform.py:44`). */
  def dropExact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** D2: keyed keep-one via `row_number` over an explicit ordering
    * (`etl/transform_1.py:82-84`). The reference tie-breaks with
    * `monotonically_increasing_id()`, which is partition-layout-dependent;
    * callers here must pass a deterministic ordering (SURVEY.md §7.3) so
    * results are reproducible and oracle-checkable.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
