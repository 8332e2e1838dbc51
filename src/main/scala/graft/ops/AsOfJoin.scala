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
    // keyCol/timeCol are NOT excluded from the collision set: a payload
    // named like either would pass a laxer check and then emit two output
    // columns with the same name (col(keyCol) plus __r.getField(keyCol)).
    val clash = payloadCols.toSet.intersect(left.columns.toSet ++ Set(keyCol, timeCol))
    require(clash.isEmpty,
      s"payload columns collide with left/key/time columns: ${clash.mkString(", ")} — rename one side")

    // The matched right row travels as ONE struct: per-column carries would
    // tear a right row apart whenever one payload field is NULL (each
    // column's last(ignoreNulls) skipping independently).
    val payloadStruct = struct(payloadCols.map(col): _*)
    val structType = {
      import org.apache.spark.sql.types.StructType
      StructType(payloadCols.map(c => right.schema(c)))
    }
    val leftRest = left.columns.filterNot(c => c == keyCol || c == timeCol).toSeq
    val l = left
      .withColumn("__side", lit(1)) // right sorts before left at equal time
      .withColumn("__r", lit(null).cast(structType))
      .select((Seq(col(keyCol), col(timeCol), col("__side"), col("__r")) ++
        leftRest.map(col)): _*)
    val r = right
      .select(col(keyCol), col(timeCol), payloadStruct.as("__r"))
      .withColumn("__side", lit(0))
      .select((Seq(col(keyCol), col(timeCol), col("__side"), col("__r")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val unioned = l.unionByName(r)
    // right (side=0) sorts before left (side=1) at the same timestamp →
    // a tying right row is visible to the left row (<= semantics). Right
    // rows tying on (key, time) are further ordered by rightOrder, falling
    // back to the payload struct itself (field-by-field struct ordering) —
    // deterministic at any partitioning.
    val tieBreak = if (rightOrder.nonEmpty) rightOrder else Seq(col("__r"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy((Seq(col(timeCol), col("__side")) ++ tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((Seq(col(keyCol), col(timeCol)) ++ leftRest.map(col) ++
        payloadCols.map(c => col("__r").getField(c).as(c))): _*)
  }
}
