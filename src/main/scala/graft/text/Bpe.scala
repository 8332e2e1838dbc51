package graft.text

import org.apache.spark.sql.DataFrame
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
}
