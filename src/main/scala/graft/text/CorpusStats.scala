package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Corpus-level statistics that need aggregation (unlike the per-row
  * signals in [[TextAnalysis]]): n-gram repetition scoring (the
  * Gopher-style "repetitious document" filters) and vocabulary building.
  *
  * Both explode to (id, gram-hash) / (token) rows and aggregate — the
  * honest distributed shape. A per-row array-function formulation would
  * avoid the shuffle but costs O(grams²) interpreted work per document
  * (higher-order-function trap, NOTES.md), which is wrong for long
  * documents; the exploded rows here are narrow (id + 8-byte hash) and
  * benefit from map-side partial aggregation.
  */
object CorpusStats {

  /** Per-document n-gram repetition report:
    * (id, n_ngrams, top_ngram_count, top_ngram_frac, dup_ngram_frac) —
    * `top_ngram_frac` is the occurrence share of the single most frequent
    * n-gram (Gopher's "top n-gram character fraction", token-weighted),
    * `dup_ngram_frac` the share of occurrences whose gram occurs more
    * than once. Documents with fewer than `n` tokens report 0 grams and
    * 0.0 fractions (nothing repeats in a document too short to repeat).
    *
    * Filters compose as e.g. `.filter(col("top_ngram_frac") < 0.2)`.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    val grams = docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(col("id"), Decontaminate.ngramsFromTokens(col("tk"), n).as("g"))
      .select(col("id"), explode(col("g")).as("gram"))
      .select(col("id"), NearDup.md5Long(col("gram")).as("gh"))
    val perGram = grams.groupBy("id", "gh").agg(count(lit(1)).as("occ"))
    val perDoc = perGram.groupBy("id").agg(
      sum(col("occ")).as("n_ngrams"),
      max(col("occ")).as("top_ngram_count"),
      sum(when(col("occ") > 1, col("occ")).otherwise(0L)).as("dup_occ"))
    docs.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_ngrams"), lit(0L)).as("n_ngrams"),
        coalesce(col("top_ngram_count"), lit(0L)).as("top_ngram_count"),
        round(coalesce(try_divide(col("top_ngram_count"), col("n_ngrams")), lit(0.0)), 6)
          .as("top_ngram_frac"),
        round(coalesce(try_divide(col("dup_occ"), col("n_ngrams")), lit(0.0)), 6)
          .as("dup_ngram_frac"))
  }

  /** Corpus vocabulary: the `topN` most frequent tokens with counts and
    * corpus share, ties broken lexicographically. Plans as partial
    * aggregation + `TakeOrderedAndProject` — no global sort of the
    * vocabulary, which at web scale is billions of distinct tokens.
    */
  def vocabulary(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val counts = docs
      .select(TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(explode(col("tk")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("occurrences"))
    // corpus total as a broadcast 1-row frame (no driver action, stays
    // lazy): summed from per-doc token counts — a narrow second scan of
    // the text column, NOT a second explode+shuffle of every token
    val total = docs
      .select(TextAnalysis.tokenCount(col(textCol)).cast("long").as("n"))
      .agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("token"), col("occurrences"),
        round(col("occurrences") / col("__total").cast("double"), 6).as("corpus_frac"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(topN)
  }
}
