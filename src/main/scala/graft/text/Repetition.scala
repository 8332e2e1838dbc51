package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NgramArray

/** Gopher-style within-document repetition filters (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", appendix A1.1 — public): a
  * document is low-quality when a large fraction of its n-grams are
  * repeats, or when a single n-gram dominates it. The reference pipeline
  * has no such operator (its corpus is relational); this is part of the
  * training-data curation tier the engine adds on top.
  *
  * Deviation from the paper, stated: Gopher weights the duplicate-gram
  * fraction by CHARACTERS covered; this implementation counts gram
  * OCCURRENCES (`(total − distinct) / total` and `top / total`), which
  * keeps every reported statistic an exact integer — hash-replayable by
  * an external engine with no float in the chain — and flags the same
  * pathology (verbatim loops, boilerplate stutter).
  *
  * Scale shape: ONE corpus scan. The per-width gram arrays are built by
  * the codegen'd [[NgramArray]] in a single projection, unpacked by two
  * chained generators (`posexplode` over the width axis, `explode` over
  * the grams), then two hash aggregations — (id, n, gram) counts, folded
  * to (id, n) stats — both with map-side partial aggregation, so the
  * shuffled bytes are per-doc DISTINCT gram counts, not raw gram
  * occurrences. The id×width grid join-back runs on the (id, n)
  * partitioning the second aggregate already produced — only the narrow
  * grid side shuffles. No driver materialization at any point.
  */
object Repetition {

  /** Per-(document, width) gram statistics: total gram occurrences,
    * distinct grams, and the most frequent gram's occurrence count.
    * Documents shorter than a width keep a (0, 0, 0) row — the report is
    * total over id × widths, so downstream gates filter rather than
    * lose rows.
    *
    * Output: (id, n, total_grams, distinct_grams, top_count), all
    * BIGINT except the INT width.
    */
  def ngramStats(docs: DataFrame, idCol: String, textCol: String,
                 widths: Seq[Int]): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ >= 1), s"bad widths: $widths")
    require(widths.distinct == widths, s"duplicate widths: $widths")
    val widthLit = array(widths.map(lit): _*)
    val toks = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))

    val stats = toks
      .select(col("id"),
        posexplode(array(widths.map(n => NgramArray.ngrams(col("toks"), n)): _*))
          .as(Seq("wi", "grams")))
      .select(col("id"), element_at(widthLit, col("wi") + 1).as("n"),
        explode(col("grams")).as("gram"))
      .groupBy("id", "n", "gram").agg(count(lit(1)).as("c"))
      .groupBy("id", "n")
      .agg(sum(col("c")).as("total_grams"),
        count(lit(1)).as("distinct_grams"),
        max(col("c")).as("top_count"))

    docs.select(col(idCol).as("id"), explode(widthLit).as("n"))
      .join(stats, Seq("id", "n"), "left")
      .select(col("id"), col("n"),
        coalesce(col("total_grams"), lit(0L)).as("total_grams"),
        coalesce(col("distinct_grams"), lit(0L)).as("distinct_grams"),
        coalesce(col("top_count"), lit(0L)).as("top_count"))
  }

  /** [[ngramStats]] plus the repetition verdict. Thresholds are per-width
    * permille maps; a document-width row is flagged when
    * `(total − distinct) · 1000 > dupPermille(n) · total` (duplicate-gram
    * share) or `top · 1000 > topPermille(n) · total` (single-gram
    * dominance). Both compares are pure BIGINT products — engines cannot
    * disagree at the boundary (the integer-exact-threshold discipline;
    * see NOTES.md round-8 lessons). Zero-gram rows are never flagged.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             dupPermille: Map[Int, Int], topPermille: Map[Int, Int]): DataFrame = {
    val widths = dupPermille.keys.toSeq.sorted
    require(widths == topPermille.keys.toSeq.sorted,
      s"threshold maps cover different widths: $dupPermille vs $topPermille")
    val dupTh = widths.foldLeft(lit(0)) { (acc, n) =>
      when(col("n") === n, lit(dupPermille(n))).otherwise(acc) }
    val topTh = widths.foldLeft(lit(0)) { (acc, n) =>
      when(col("n") === n, lit(topPermille(n))).otherwise(acc) }
    ngramStats(docs, idCol, textCol, widths)
      .select(col("id"), col("n"), col("total_grams"), col("distinct_grams"),
        col("top_count"),
        (col("total_grams") > 0 &&
          ((col("total_grams") - col("distinct_grams")) * 1000 >
             dupTh.cast("long") * col("total_grams") ||
           col("top_count") * 1000 > topTh.cast("long") * col("total_grams")))
          .as("rep_flag"))
  }
}
