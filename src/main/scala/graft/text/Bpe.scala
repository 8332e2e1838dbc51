package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge statistics — the corpus-scale counting
  * step of tokenizer training. A full BPE train is an iterated
  * sequence of (count adjacent pairs → merge the argmax); the count
  * step is the distributed-heavy part (it scans the corpus), and this
  * module provides it as one shuffle of 2-char keys: explode words to
  * adjacent character pairs, partial-aggregate counts map-side, rank.
  * An engine user runs it per merge round against the current vocab —
  * the per-round argmax table below IS the training loop's inner step
  * at its first round (character alphabet), which is also the round
  * that dominates cost (every later round operates on the shrinking
  * merged sequence).
  *
  * Occurrences are counted per word INSTANCE (not per distinct word):
  * BPE weights pairs by corpus frequency. Pure string ops + one
  * group-by — no RNG, no floats, replayable anywhere.
  *
  * Tokenization convention (all three entry points): words are
  * `lower(text)` split on a LITERAL single space, empties dropped —
  * the exact semantics of SQL `string_split(lower(text), ' ')`, so
  * the whole module replays in any engine. Tabs/newlines are NOT
  * separators; a corpus with those should be normalized first (see
  * [[graft.text.Normalize]]).
  *
  * Precondition: input text must not contain the literal `'|'`
  * character — it is the internal symbol delimiter (a word `"a|b"`
  * would produce empty symbols and ambiguous merges, identically in
  * both engines). Strip or remap pipes upstream if a corpus can
  * contain them.
  */
object Bpe {

  /** Top-`k` first-round merge candidates: adjacent character pairs
    * inside whitespace-delimited lowercased words, ranked by corpus
    * count with a deterministic (count DESC, pair ASC) tie-break.
    * Returns (pair, pair_count).
    */
  def mergeCandidates(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(k)
  }

  /** Exact leftmost-greedy non-overlapping application of one merge
    * (`pa`, `pb`) to a `'|'`-piped symbol string: fold the symbols
    * left to right with a string accumulator; merge exactly when the
    * accumulator's LAST symbol is `pa` and the incoming symbol is
    * `pb`. A symbol merged THIS round is `pa+pb`, which can never
    * equal `pa` (`pb` is nonempty), so the ends-with test cannot
    * re-consume an already-merged symbol — this is precisely the BPE
    * scan rule, including odd runs of a repeated symbol: merging
    * (a, a) on "aaaaa" yields [aa, aa, a], where a global
    * double-`replace` would commit [aa, a, aa] (the second match in a
    * left-to-right replace pass steals the delimiter of the third).
    * The DuckDB oracle replays the same fold with `list_reduce`,
    * character for character.
    */
  private def mergeApply(s: Column, pa: String, pb: String): Column = {
    val syms = split(trim(s, "|"), "\\|")
    aggregate(syms, lit("|"), (acc, x) =>
      when(acc.endsWith(lit("|" + pa + "|")) && x === lit(pb),
        concat(acc.substr(lit(1), length(acc) - length(lit(pa)) - 1),
          lit(pa + pb + "|")))
        .otherwise(concat(acc, x, lit("|"))))
  }

  /** The ACTUAL iterated BPE trainer, distributed: `rounds` iterations
    * of (count adjacent symbol pairs → argmax → merge everywhere).
    * Returns one row per round: (round, pa, pb, merged, pair_count).
    *
    * Scale shape: the corpus is scanned ONCE (word histogram —
    * `(word, n)` is tiny next to the corpus and is `localCheckpoint`ed);
    * every round then runs on that table: one explode + partial-agg for
    * the counts, a 1-row argmax to the driver (the same
    * literal-back-into-the-plan move as k-means centroids), and a
    * narrow merge-apply map. Nothing per-round touches the corpus.
    *
    * Representation: a word's symbol sequence is a `'|'`-delimited
    * string with sentinels — `"hello"` → `"|h|e|l|l|o|"` — and the
    * merge of (pa, pb) is the exact leftmost-greedy fold of
    * [[mergeApply]]. No RNG, no floats, ties broken (count DESC,
    * pa ASC, pb ASC) — the whole LOOP is oracle-replayable round for
    * round.
    */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val spark = docs.sparkSession
    val words0 = docs
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(lit("|"),
        regexp_replace(col("w"), "(.)", "$1|")).as("s"), col("n"))
      .localCheckpoint()

    var cur = words0
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val syms = cur
        .select(col("n"), split(expr("trim(BOTH '|' FROM s)"), "\\|").as("a"))
        .filter(size(col("a")) >= 2)
      val best = syms
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> struct(element_at(a, i) AS pa, element_at(a, i + 1) AS pb))")).as("p"))
        .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
        .agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("pa"), col("pb"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (pa, pb, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((r, pa, pb, pa + pb, cnt))
        cur = cur
          .select(mergeApply(col("s"), pa, pb).as("s"), col("n"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    out.toSeq.toDF("round", "pa", "pb", "merged", "pair_count")
  }

  /** BPE ENCODE with a trained merge list: per-document token counts
    * after applying `merges` (rank order, each via the leftmost-greedy
    * [[mergeApply]]) to every word. The merge application runs on the
    * DISTINCT-word vocabulary (merge chains are vocab-sized work, not
    * corpus-sized); the corpus pays one explode + one string equi-join
    * + one per-doc agg. Returns (idCol, n_tokens_bpe) — the post-merge
    * token count, the number a token-budget planner actually needs
    * after tokenizer training.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val docWords = docs
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) >= 1)
    val piped = concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|"))
    val applied = merges.foldLeft(piped) { case (s, (pa, pb)) =>
      mergeApply(s, pa, pb)
    }
    val vocab = docWords.select("w").distinct()
      .withColumn("s", applied)
      .select(col("w"),
        size(split(expr("trim(BOTH '|' FROM s)"), "\\|")).cast("long").as("nt"))
    docWords.join(vocab, "w")
      .groupBy(col(idCol))
      .agg(sum(col("nt")).as("n_tokens_bpe"))
  }
}
