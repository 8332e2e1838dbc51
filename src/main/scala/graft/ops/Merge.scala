package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture application — the lakehouse MERGE the reference's
  * load stage approximates with full-partition dynamic overwrite
  * (`etl/load_1.py` rewrites whole partitions because Glue-on-S3 has no
  * row-level upsert). Expressed Spark-first, the same contract is a pure
  * dataframe computation: the merged snapshot is derivable from
  * (snapshot, change batch) with two shuffles on the merge key, and the
  * caller writes it back with the existing atomic partitioned writers
  * ([[graft.pipeline.Transform]]).
  *
  * Scale shape: the change batch is normally orders of magnitude smaller
  * than the snapshot, so the winner-per-key window runs on the small side
  * and AQE broadcasts it into the anti join — the snapshot is scanned
  * once, shuffled zero times. Nothing here collects or widens rows.
  */
object Merge {

  /** Apply a CDC change batch to a snapshot keyed by `keyCols`.
    *
    * `changes` carries the snapshot's columns plus `opCol` (one of
    * 'I'/'U'/'D') and `seqCol` (change-log position; per-key ties break
    * on `opCol` descending, so a same-sequence U beats a D
    * deterministically). Latest change per key wins; a winning I/U row
    * replaces (or introduces) the key's row, a winning D removes it;
    * snapshot keys without a change pass through untouched.
    *
    * Determinism contract: (`seqCol`, `opCol`) must be unique per key —
    * which a change-LOG position is by construction. Two changes sharing
    * both would leave the winner's payload to partition order; collapse
    * such feeds upstream before applying.
    *
    * Both joins hash on the merge key only; payload columns ride along
    * untouched, so wide snapshots do not widen the shuffle of the
    * (small) change side.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], seqCol: String,
                   opCol: String): DataFrame = {
    val payload = snapshot.columns.toSeq
    val winner = changes
      .withColumn("__rn", Windows.rowNumber(keyCols.map(col),
        Seq(col(seqCol).desc, col(opCol).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val untouched =
      snapshot.join(winner.select(keyCols.map(col): _*), keyCols, "left_anti")
    val upserted =
      winner.filter(col(opCol) =!= "D").select(payload.map(col): _*)
    untouched.unionByName(upserted)
  }

  /** Apply one batch of dimension changes to a slowly-changing-dimension
    * type-2 history table.
    *
    * `dim` holds the full history: payload columns plus `validFrom` /
    * `validTo`, with `validTo IS NULL` marking each key's current row.
    * `changes` holds at most one row per key (pre-collapse a raw log with
    * [[applyChanges]]-style winner-per-key first): the new payload plus
    * `effectiveCol`, the instant the new version takes effect.
    *
    * The result is the complete new history:
    *   - closed history rows pass through verbatim;
    *   - current rows of unchanged keys pass through verbatim;
    *   - current rows of changed keys are closed out
    *     (`validTo := effective`);
    *   - each change appends a new current row
    *     (`validFrom := effective`, `validTo := NULL`) — also for keys
    *     the dimension has never seen.
    *
    * An effective instant at or before a current row's `validFrom` would
    * produce an empty or inverted interval; this operator applies the
    * batch as given and leaves validity auditing to the caller (the
    * standard contract of warehouse MERGE-based SCD2 loads).
    *
    * Scale shape: one shuffle of the (small) change batch against the
    * current slice on the key — history rows are routed by a codegen'd
    * filter without touching any exchange, and AQE broadcasts the change
    * side into both the close-out join and the anti join.
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCols: Seq[String],
                validFrom: String, validTo: String,
                effectiveCol: String): DataFrame = {
    val validToType = dim.schema(validTo).dataType
    val eff = changes.select(
      keyCols.map(col) :+ col(effectiveCol).cast(validToType).as("__eff"): _*)
    val history = dim.filter(col(validTo).isNotNull)
    val current = dim.filter(col(validTo).isNull)
    val closedOut = current.drop(validTo)
      .join(eff, keyCols)
      .withColumnRenamed("__eff", validTo)
      .select(dim.columns.map(col): _*)
    val untouched = current.join(eff.select(keyCols.map(col): _*), keyCols, "left_anti")
    val fresh = changes
      .withColumn(validFrom, col(effectiveCol).cast(dim.schema(validFrom).dataType))
      .withColumn(validTo, lit(null).cast(validToType))
      .select(dim.columns.map(col): _*)
    history.unionByName(untouched).unionByName(closedOut).unionByName(fresh)
  }

  /** Incremental aggregate maintenance — the materialized-rollup upsert of
    * a lambda/medallion architecture: `acc` holds per-key running sums
    * (`sumCols`) and a row count (`countCol`); `batch` is new raw rows.
    * The batch is partial-aggregated FIRST (map-side combine on the
    * small new data), then merged with a full-outer union-style
    * `groupBy.sum` — so the accumulator table is never re-scanned per
    * row, only per key it already stores, and a re-run of the same
    * merged result is derivable idempotently by the caller keying writes
    * on a batch id.
    *
    * Only distributive aggregates (sum, count — and min/max by the same
    * pattern) can be maintained this way; AVG is derived `sum/count` at
    * read time, and holistic aggregates (median, distinct) need their
    * own sketch or full recompute — the standard materialized-view
    * contract.
    */
  def upsertAggregates(acc: DataFrame, batch: DataFrame, keyCols: Seq[String],
                       sumCols: Seq[String], countCol: String): DataFrame = {
    val batchAgg = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)): _*)
    acc.unionByName(batchAgg)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(countCol)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)): _*)
      .select(acc.columns.map(col): _*)
  }
}
