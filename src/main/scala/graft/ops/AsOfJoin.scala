package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row whose
  * time is ≤ the left row's time, per key — the point-in-time lookup at
  * the heart of feature stores and market-data pipelines, which Spark has
  * no native operator for.
  *
  * Built by composition (preference (a) of the custom-operator ladder —
  * no custom SparkPlan needed): tag and union both sides, sort within one
  * hash(key) exchange, carry the latest right payload forward with
  * `last(ignoreNulls)` over an unbounded-preceding window, keep left rows.
  *
  * Cost at 100 TB: ONE shuffle of (|L| + |R|) rows on the key — the same
  * price as the sort-merge join an equality join would pay; no range
  * explosion, no per-row probing. Ties (right.time == left.time) are
  * included (`<=` semantics, matching DuckDB's ASOF JOIN). Right rows at
  * identical (key, time) resolve by `rightOrder`, falling back to the
  * payload values themselves so the result is deterministic at any
  * partitioning even without an explicit tie-break.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           keyCol: String, timeCol: String,
           payloadCols: Seq[String],
           rightOrder: Seq[Column] = Seq.empty): DataFrame = {
    val lTagged = left
      .withColumn("__side", lit(1)) // right sorts before left at equal time
    val rTagged = right
      .select((Seq(col(keyCol), col(timeCol)) ++ payloadCols.map(col)): _*)
      .withColumn("__side", lit(0))
    // align schemas: left keeps its columns, right contributes payloads
    val leftCols = left.columns
    val allPayload = payloadCols.map(c => s"__r_$c")
    val l = lTagged.select(
      (Seq(col(keyCol), col(timeCol), col("__side")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol).map(col)): _*)
    val r = rTagged.select(
      (Seq(col(keyCol), col(timeCol), col("__side")) ++
        payloadCols.map(c => col(c).as(s"__r_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val unioned = l.unionByName(r)
    // right (side=0) sorts before left (side=1) at the same timestamp →
    // a tying right row is visible to the left row (<= semantics). Right
    // rows tying on (key, time) are further ordered by rightOrder, then by
    // the payload values — without this, "last" among duplicates would
    // depend on shuffle order.
    val tieBreak =
      if (rightOrder.nonEmpty) rightOrder else allPayload.map(col)
    val w = Window.partitionBy(col(keyCol))
      .orderBy((Seq(col(timeCol), col("__side")) ++ tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = allPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__side")
      .withColumnsRenamed(payloadCols.map(c => s"__r_$c" -> c).toMap)
  }
}
