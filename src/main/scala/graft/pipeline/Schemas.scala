package graft.pipeline

import org.apache.spark.sql.types._

/** Declared schemas of the reference's catalog tables (SURVEY.md §1).
  *
  * Two schema generations coexist in the reference: v1 English
  * (`etl/extract.py:42-51`) and v2 Portuguese (`etl/etl.py:39-48`); the
  * refined output schema is `etl/load.py:47-62` with the documented type
  * fix (`theoricalQty` is written as long per `transform_1.py:71` even
  * though the catalog declares string — we use the actual written type).
  */
object Schemas {

  /** Raw v1 (English) — `extract.py:42-51`. `part` arrives comma-decimal,
    * `theoricalQty` thousands-formatted; both as strings (§1.2).
    */
  val rawV1: StructType = StructType(Seq(
    StructField("segment", IntegerType),
    StructField("cod", StringType),
    StructField("asset", StringType),
    StructField("type", StringType),
    StructField("part", StringType),
    StructField("partAcum", IntegerType),
    StructField("theoricalQty", StringType),
    StructField("date", StringType) // partition key, yyyy-MM-dd
  ))

  /** Raw v2 (Portuguese) — the 8 columns `etl.py:39-48` selects. */
  val rawV2: StructType = StructType(Seq(
    StructField("setor", StringType),
    StructField("codigo", StringType),
    StructField("acao", StringType),
    StructField("tipo", StringType),
    StructField("porcentagem_participacao", DoubleType),
    StructField("porcentagem_participacao_acumulada", DoubleType),
    StructField("quantidade_teorica", LongType),
    StructField("data_pregao", StringType) // date-as-string, sentinel-filled
  ))

  /** Refined v1 output — `load.py:47-62`, type-corrected (FIXTURES.md §1.3).
    * Partition columns `code`, `reference_date` come last, matching the
    * physical `partitionBy` layout (`transform_1.py:112`).
    */
  val refinedV1: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("type", StringType),
    StructField("part", DoubleType),
    StructField("theoricalQty", LongType),
    StructField("initial_date", StringType),
    StructField("mean_part_7_days", DoubleType),
    StructField("median_part_7_days", DoubleType),
    StructField("std_part_7_days", DoubleType),
    StructField("max_part_7_days", DoubleType),
    StructField("min_part_7_days", DoubleType),
    StructField("code", StringType),
    StructField("reference_date", StringType)
  ))
}
