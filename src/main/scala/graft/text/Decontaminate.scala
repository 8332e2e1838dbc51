package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Benchmark decontamination for training corpora: flag training documents
  * whose token n-grams overlap an evaluation/benchmark set (the exact-match
  * n-gram method used to decontaminate GPT-3/Pile-style corpora).
  *
  * Scale shape: n-grams travel as distinct 60-bit md5-derived hashes
  * ([[NearDup.md5Long]]), so the contamination join shuffles (id, 8-byte
  * hash) rows — never document text — and the benchmark side is
  * distinct-reduced before the join. Real eval sets are tiny next to a
  * 100 TB corpus, so AQE turns that join side into a broadcast by itself;
  * nothing here assumes it (a "benchmark" as large as the corpus still
  * runs as a plain hash join).
  */
object Decontaminate {

  /** Token n-gram strings ("a b c" for n=3) from a *staged* token array
    * column (same staging discipline as
    * [[TextAnalysis.shinglesFromTokens]] — higher-order functions are
    * interpreted, so `toks` must be a materialized attribute). Documents
    * with fewer than `n` tokens yield an empty array: a doc too short to
    * have any n-gram cannot be n-gram-contaminated.
    */
  def ngramsFromTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"n=$n: n-gram width must be >= 1")
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*))
    when(size(toks) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Distinct (id, gram-hash) pairs per document: tokens and grams staged
    * as separate projections, md5 applied per exploded gram row (codegen'd,
    * not under a lambda).
    */
  def ngramHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("tk"))
      .select(col("id"), ngramsFromTokens(col("tk"), n).as("g"))
      .select(col("id"), explode(col("g")).as("gram"))
      .select(col("id"), NearDup.md5Long(col("gram")).as("gh"))
      .distinct()

  /** Per-training-document contamination report against `bench`:
    * (id, n_grams, n_hits, overlap, contaminated) where `n_hits` counts the
    * training doc's distinct n-grams that appear anywhere in the benchmark
    * set, `overlap` = n_hits / n_grams, and `contaminated` flags docs with
    * at least `minHits` matching n-grams. Every training id appears in the
    * output (docs shorter than n tokens report 0 grams / clean), so the
    * result can drive an anti-join filter directly.
    */
  def flagContaminated(train: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String,
                       n: Int = 13, minHits: Long = 1L): DataFrame = {
    val trainGrams = ngramHashes(train, idCol, textCol, n)
    val benchGrams = ngramHashes(bench, idCol, textCol, n)
      .select("gh").distinct()
    val totals = trainGrams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val hits = trainGrams.join(benchGrams, "gh")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol).as("id"))
      .join(totals, Seq("id"), "left")
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(try_divide(col("n_hits"), col("n_grams")), lit(0.0)), 6).as("overlap"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("contaminated"))
  }

  /** The filter form: `train` minus contaminated docs — the operator a
    * pipeline actually composes ([[flagContaminated]] is the report form).
    */
  def removeContaminated(train: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 13, minHits: Long = 1L): DataFrame = {
    val bad = flagContaminated(train, bench, idCol, textCol, n, minHits)
      .filter(col("contaminated")).select(col("id"))
    train.join(bad, train(idCol) === bad("id"), "left_anti")
  }
}
