package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Exact-substring duplication profiling — the character-shingle form
  * of corpus dedup (the "dedup by exact 50-token spans" recipe from the
  * published deduplicate-training-data line of work, re-expressed as a
  * hash group-by instead of a suffix array: at 100 TB a distributed
  * suffix array is a research project, while hashed fixed-width spans
  * are one shuffle of 8-byte keys and catch the same verbatim reuse).
  *
  * Complements [[Chunker.chunkDedup]] (chunk-granular: WHICH chunks to
  * drop) with a per-document duplication PROFILE (how much of each doc
  * is verbatim-shared), the gating signal curation pipelines use to
  * drop boilerplate-heavy documents outright.
  *
  * Scale shape: each doc emits ~len/stride shingle HASHES (60-bit
  * md5-derived longs — shuffle rows are 16 bytes, never text), the
  * global count is one partial-aggregated group-by, and the flag-back
  * join re-uses the same hash partitioning. Nothing is pairwise;
  * per-doc output is one row.
  */
object SubstrDedup {

  /** Per-document duplicated-span profile: stride-`stride` windows of
    * `window` chars, a window is DUPLICATED iff its exact text occurs
    * anywhere else in the corpus (another doc, or another position of
    * the same doc — self-plagiarism is still training-set repetition).
    *
    * Returns (id, total_shingles, dup_shingles, dup_ppm) with dup_ppm
    * the integer parts-per-million duplicated fraction — exact integer
    * arithmetic, replayable on any engine. Docs shorter than `window`
    * chars emit no row (no span to judge).
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               window: Int = 32, stride: Int = 16): DataFrame = {
    require(window >= 1 && stride >= 1,
      s"window=$window and stride=$stride must be >= 1")
    val sh = docs
      .filter(length(col(textCol)) >= window)
      .select(col(idCol).as("id"),
        explode(sequence(lit(0), length(col(textCol)) - window,
          lit(stride))).as("pos"),
        col(textCol).as("__t"))
      .select(col("id"),
        NearDup.md5Long(expr(s"substring(__t, pos + 1, $window)")).as("h"))
    // Global occurrence count as a window over the span hash, NOT a
    // groupBy + join-back: the join form reads the corpus (and re-runs
    // shingle extraction) twice — once feeding the count aggregate,
    // once on the probe side — because the pre-aggregated count
    // exchange can't be reused by the probe exchange. The window form
    // is one scan and one shuffle of (id, h) pairs. Partition cardinality
    // is the 60-bit hash space (the low-cardinality-window anti-pattern
    // does not apply); the residual skew exposure — ONE exact span
    // verbatim-repeated ~10⁸ times lands its rows in one window
    // partition — is shared by the join form (same co-location need)
    // and marks a corpus that should be gated on [[Repetition]] first.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    sh.withColumn("c", count(lit(1)).over(w))
      .groupBy("id")
      .agg(count(lit(1)).as("total_shingles"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_shingles"))
      .select(col("id"), col("total_shingles"), col("dup_shingles"),
        expr("(1000000 * dup_shingles) DIV total_shingles").as("dup_ppm"))
  }
}
