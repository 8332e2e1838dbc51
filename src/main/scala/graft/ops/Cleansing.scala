package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cleansing operators: projection/rename/column surgery (SURVEY.md §2.2),
  * null handling (§2.5) and scalar sanitizer casts (§2.6).
  *
  * All operators are narrow (no shuffle) except [[pruneAllNullColumns]],
  * which by design runs one eager aggregation job — the output schema is
  * data-dependent (`etl/transform_1.py:50-55`), so it cannot be a lazy rule.
  * At 100 TB that aggregation is a single map-side-combined `count` per
  * column (no row data moves, only 1 row per partition shuffles), which is
  * the cheapest possible full-scan statistic.
  *
  * Sanitizer casts use `try_cast` semantics so dirty rows degrade to NULL
  * (the reference ran Spark 3.5 non-ANSI where `cast` was lax; Spark 4 ANSI
  * mode would throw mid-job on a 100 TB scan — a NULL + downstream
  * `fillDefaults` is the scale-safe equivalent).
  */
object Cleansing {

  /** P1: keep a fixed column list (`etl/etl.py:39-48`). Column pruning then
    * reaches the parquet scan (`ReadSchema`), so unused columns are never
    * decoded.
    */
  def selectColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** P3: bulk rename (`etl/etl.py:65-66`, `etl/transform_1.py:58-63`).
    * Renames only when the source column exists, matching the reference's
    * presence-conditional renames.
    */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame = {
    val present = renames.filter { case (from, _) => df.columns.contains(from) }
    df.withColumnsRenamed(present)
  }

  /** A1/P2 input: one-row aggregate of non-null counts for every column
    * (`etl/transform_1.py:53`). Eager.
    */
  def nonNullCounts(df: DataFrame): Row =
    df.select(df.columns.map(c => count(col(c)).alias(c)).toSeq: _*).first()

  /** P2: drop all-null columns unless listed as essential
    * (`etl/transform_1.py:50-55`). Eager two-job pattern by design — the
    * output schema depends on the data, so the plan boundary is explicit.
    */
  def pruneAllNullColumns(df: DataFrame, essential: Set[String]): DataFrame = {
    val counts = nonNullCounts(df)
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if essential.contains(c) || counts.getLong(i) > 0L => c
    }
    df.select(keep.map(col).toSeq: _*)
  }

  /** N1: fill per-column defaults (`etl/etl.py:50-58`) — strings →
    * "UNKNOWN", numerics → 0.
    */
  def fillDefaults(df: DataFrame, defaults: Map[String, Any]): DataFrame =
    df.na.fill(defaults)

  /** N2: sentinel date — cast to string then fill `"1970-01-01"`
    * (`etl/etl.py:59-62`).
    */
  def fillSentinelDate(df: DataFrame, dateCol: String,
                       sentinel: String = "1970-01-01"): DataFrame =
    df.withColumn(dateCol, col(dateCol).cast(StringType))
      .na.fill(Map(dateCol -> sentinel))

  /** C3: comma-decimal string → double: `"5,123"` → 5.123
    * (`etl/transform_1.py:67`). NULL on garbage instead of ANSI error.
    */
  def commaDecimalToDouble(c: Column): Column =
    regexp_replace(c, ",", ".").try_cast(DoubleType)

  /** C4: thousands-formatted quantity string → long: `"1.234.567"` →
    * 1234567, keeping a leading minus (`etl/transform_1.py:71`).
    */
  def formattedToLong(c: Column): Column =
    regexp_replace(c, "[^0-9-]", "").try_cast(LongType)

  /** C5: string → date with explicit pattern (`etl/transform_1.py:74`).
    * try_to_timestamp: under ANSI a malformed date string would abort the
    * job mid-scan; NULL + the downstream F1 guard reproduces the
    * reference's lax Spark-3.5 behavior.
    */
  def toDatePattern(c: Column, pattern: String = "yyyy-MM-dd"): Column =
    try_to_timestamp(c, lit(pattern)).cast(DateType)

  /** C6: date/timestamp → `yyyy-MM-dd` string for partition values
    * (`etl/etl.py:85`, `etl/transform_1.py:89,109`).
    */
  def formatPartitionDate(c: Column): Column =
    date_format(c, "yyyy-MM-dd")

  /** F1: null-rejecting guard on partition-key columns
    * (`etl/transform_1.py:79`). Catalyst pushes this into the scan.
    */
  def filterNotNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
}
