package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact multi-token phrase search over a document corpus — "grep the
  * lake" as a relational plan. The use case in a training-data
  * pipeline: find every document containing an exact quoted phrase
  * (a benchmark prompt, a memorized passage, a license header) without
  * a substring scan per document pair.
  *
  * Algorithm (positional-postings alignment, the standard inverted-index
  * phrase trick expressed as ONE aggregation instead of k self-joins):
  * explode documents to positional postings `(id, pos, token)`, keep
  * only tokens occurring in the phrase, and for every posting row and
  * every phrase slot `idx` holding that token emit the candidate start
  * `p0 = pos - idx`. A phrase of k tokens starts at `p0` iff ALL k
  * slots contributed a row for that `(id, p0)` — `count(distinct idx)
  * = k` after a single `(id, p0)` group-by. Repeated tokens inside the
  * phrase are handled exactly: each slot must be witnessed by a
  * posting at its own offset.
  *
  * Scale shape: one corpus explode, a token IN-set filter that reaches
  * the scan (the phrase set is a literal array — only postings for
  * phrase tokens survive the projection, the inverted-index access
  * path), then one shuffle keyed on `(id, p0)` whose cardinality is
  * bounded by phrase-token occurrences, not corpus tokens. No join at
  * all, nothing pairwise, no cascade of k self-joins (the textbook
  * formulation — k shuffles and k plan branches — is strictly worse).
  *
  * Tokenization convention: literal single-space split, positions over
  * the RAW split (empties keep their slot so positions agree with any
  * engine's `string_split`), matching [[Bpe]]'s replayability contract.
  */
object PhraseSearch {

  /** Per-document exact-phrase hit counts: (idCol, n_matches,
    * first_pos) for documents with >= 1 match; `first_pos` is the
    * 1-based token position of the earliest match. Case-sensitive by
    * default — pass `lowercase = true` to match case-insensitively
    * (both text and phrase are lowered).
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
                    phrase: Seq[String], lowercase: Boolean = false): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase tokens must be non-empty and whitespace-free: $phrase")
    val k = phrase.size
    val ph = if (lowercase) phrase.map(_.toLowerCase) else phrase
    val text = if (lowercase) lower(col(textCol)) else col(textCol)
    // (id, pos, token), 1-based positions over the raw split
    val postings = docs
      .select(col(idCol).as("id"), posexplode(split(text, " ")).as(Seq("pos0", "tok")))
      .select(col("id"), (col("pos0") + 1).as("pos"), col("tok"))
      .filter(col("tok").isin(ph.distinct: _*))
    // each phrase slot this token could witness -> candidate start p0
    val slotsFor = ph.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val slotExpr = ph.distinct.foldLeft(lit(null).cast("array<int>")) { (acc, t) =>
      when(col("tok") === t, array(slotsFor(t).map(i => lit(i)): _*)).otherwise(acc)
    }
    val starts = postings
      .select(col("id"), col("pos"), explode(slotExpr).as("idx"))
      .select(col("id"), (col("pos") - col("idx")).as("p0"), col("idx"))
      .filter(col("p0") >= 1)
    starts.groupBy("id", "p0")
      .agg(count_distinct(col("idx")).as("__slots"))
      .filter(col("__slots") === k)
      .groupBy("id")
      .agg(count(lit(1)).as("n_matches"), min(col("p0")).as("first_pos"))
      .select(col("id").as(idCol), col("n_matches"), col("first_pos"))
  }
}
