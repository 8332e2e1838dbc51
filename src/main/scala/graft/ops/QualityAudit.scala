package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality profiling: per-column completeness and
  * cardinality metrics for a table, computed in ONE aggregation pass —
  * the pre-load validation gate a production pipeline runs before the
  * reference's load stage commits a partition
  * (`etl/load_1.py` trusts its input; a 100 TB pipeline cannot).
  *
  * All requested columns share a single scan and a single partial-agg →
  * final-agg exchange of one row per partition; the long-format report
  * is an explode of the 1-row result, not a per-column pass. By default
  * distinct counts are HyperLogLog sketches (`approx_count_distinct`,
  * mergeable partials, constant memory — the only sane choice at scale);
  * `exact = true` switches to exact COUNT(DISTINCT) for replayable
  * audits of bounded tables, at the cost of Spark's expand-based
  * multi-distinct plan.
  */
object QualityAudit {

  /** Profile `cols` of `df`: one row per column —
    * (col_name, n_rows, n_nonnull, n_distinct, completeness), completeness
    * ROUNDed, NULL on an empty table rather than a divide error.
    */
  def audit(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "audit needs at least one column")
    def distinctOf(c: String): Column =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"), distinctOf(c).cast("long").as(s"__nd_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(col("__rows"), explode(array(entries: _*)).as("m"))
      .select(col("m.col_name").as("col_name"),
        col("__rows").as("n_rows"),
        col("m.n_nonnull").as("n_nonnull"),
        col("m.n_distinct").as("n_distinct"),
        round(try_divide(col("m.n_nonnull"), col("__rows")), 6).as("completeness"))
  }
}
