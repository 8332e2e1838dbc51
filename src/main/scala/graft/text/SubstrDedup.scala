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

  /** Maximal duplicated CHARACTER RANGES per document — the actionable
    * output of exact-substring dedup: not "this doc is 40% duplicated"
    * ([[dupSpans]]) but "delete bytes [start, end] of doc X" (the
    * published remove-the-span recipe, rather than dropping whole
    * documents that contain one boilerplate block).
    *
    * Same shingle/count machinery as [[dupSpans]]; duplicated window
    * positions are then merged into maximal ranges with the
    * islands-and-gaps trick: window starts are multiples of `stride`,
    * so consecutive duplicated starts satisfy `pos/stride - rank =
    * const` — one per-doc window over the (small) duplicated-position
    * subset, grouped by that constant. Overlapping/adjacent windows
    * (gap ≤ `window` chars, i.e. start delta ≤ window) merge into one
    * island when `stride <= window` (the overlapping-shingle setup);
    * `mergeGapWindows` extends the island rule to bridge runs whose
    * start delta is up to `mergeGapWindows` strides (0 = exact
    * adjacency only).
    *
    * Returns (id, span_start, span_end, n_windows, span_chars), spans
    * 1-based inclusive character positions, ordered within a doc by
    * span_start. Scale shape: everything after the global count is
    * keyed on (id) with per-doc row counts ≤ len/stride — the range
    * merge adds no corpus-sized shuffle.
    */
  def dupSpanRanges(docs: DataFrame, idCol: String, textCol: String,
                    window: Int = 32, stride: Int = 16,
                    mergeGapWindows: Int = 0): DataFrame = {
    require(window >= 1 && stride >= 1,
      s"window=$window and stride=$stride must be >= 1")
    require(mergeGapWindows >= 0, s"mergeGapWindows=$mergeGapWindows must be >= 0")
    val sh = docs
      .filter(length(col(textCol)) >= window)
      .select(col(idCol).as("id"),
        explode(sequence(lit(0), length(col(textCol)) - window,
          lit(stride))).as("pos"),
        col(textCol).as("__t"))
      .select(col("id"), col("pos"),
        NearDup.md5Long(expr(s"substring(__t, pos + 1, $window)")).as("h"))
    val wh = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val dup = sh.withColumn("c", count(lit(1)).over(wh))
      .filter(col("c") > 1)
      .select(col("id"), col("pos"))
    // islands: consecutive dup starts (stride steps, bridging up to
    // mergeGapWindows missing steps) share pos/stride - rank·(gap+1)…
    // with gaps > 0 the classic difference trick needs the gap-aware
    // form: break a new island when the delta to the previous dup
    // start exceeds (mergeGapWindows + 1)·stride.
    val wid = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
    val maxDelta = (mergeGapWindows + 1) * stride
    val ranges = dup
      .withColumn("__brk",
        when(col("pos") - lag(col("pos"), 1).over(wid) <= maxDelta, 0L).otherwise(1L))
      .withColumn("__isl", sum(col("__brk")).over(
        wid.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("id", "__isl")
      .agg(min(col("pos")).as("__p0"), max(col("pos")).as("__p1"),
        count(lit(1)).as("n_windows"))
    ranges.select(col("id"),
        (col("__p0") + 1).as("span_start"),
        (col("__p1") + window).as("span_end"),
        col("n_windows"),
        (col("__p1") + window - col("__p0")).as("span_chars"))
  }

  /** APPLY the span removal: every document comes back with its
    * duplicated ranges ([[dupSpanRanges]]) cut out and the remainder
    * stitched — the "clean the corpus" verb that the detection step
    * feeds. Returns one row per input document (untouched docs pass
    * through verbatim): (id, orig_chars, clean_chars, removed_chars,
    * clean_text).
    *
    * The stitch is a single `aggregate` fold over the doc's sorted,
    * non-overlapping span array (islands output is both by
    * construction): accumulator (pos, s) appends the kept segment
    * before each span and jumps past it; the finish lambda appends the
    * tail. Per-doc work is O(len); the only added shuffle is the
    * ranges' per-doc collect_list — duplicated-subset-sized, not
    * corpus-sized.
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     window: Int = 32, stride: Int = 16,
                     mergeGapWindows: Int = 0): DataFrame = {
    val ranges = dupSpanRanges(docs, idCol, textCol, window, stride, mergeGapWindows)
    val perDoc = ranges.groupBy("id")
      .agg(array_sort(collect_list(struct(col("span_start"), col("span_end"))))
        .as("__spans"))
    val joined = docs.select(col(idCol).as("id"), col(textCol).as("__t"))
      .join(perDoc, Seq("id"), "left")
    val folded = aggregate(
      col("__spans"),
      struct(lit(1).as("pos"), lit("").as("s")),
      (acc, r) => struct(
        (r.getField("span_end") + 1).as("pos"),
        concat(acc.getField("s"),
          col("__t").substr(acc.getField("pos"),
            greatest(r.getField("span_start") - acc.getField("pos"), lit(0))))
          .as("s")),
      acc => concat(acc.getField("s"),
        col("__t").substr(acc.getField("pos"),
          greatest(length(col("__t")) - acc.getField("pos") + 1, lit(0)))))
    joined
      .withColumn("clean_text",
        when(col("__spans").isNull, col("__t")).otherwise(folded))
      .select(col("id"), length(col("__t")).as("orig_chars"),
        length(col("clean_text")).as("clean_chars"),
        (length(col("__t")) - length(col("clean_text"))).as("removed_chars"),
        col("clean_text"))
  }
}
