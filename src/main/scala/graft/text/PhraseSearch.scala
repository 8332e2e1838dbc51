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
  * Scale shape: one corpus explode, an inner BROADCAST join against the
  * tiny `(token, phrase, slot)` lookup table (sum-of-phrase-lengths
  * rows — kilobytes even for a 500-prompt decontamination sweep) that
  * both filters to phrase tokens and fans out slots in one hash probe,
  * then one shuffle keyed on `(id, p0)` whose cardinality is bounded by
  * phrase-token occurrences, not corpus tokens. Nothing pairwise, no
  * cascade of k self-joins (the textbook formulation — k shuffles and
  * k plan branches — is strictly worse), and — unlike an IN-set filter
  * plus a chained `when` slot expression — the plan size is CONSTANT in
  * the number of distinct phrase tokens: a thousand-prompt sweep grows
  * the broadcast table, never the expression tree, so codegen and
  * analysis cost stay flat.
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
                    phrase: Seq[String], lowercase: Boolean = false): DataFrame =
    multiPhraseMatches(docs, idCol, textCol, Seq(phrase), lowercase)
      .select(col(idCol), col("n_matches"), col("first_pos"))

  /** N phrases in ONE corpus pass — the decontamination-sweep shape
    * (hundreds of benchmark prompts checked against the whole corpus at
    * once). Identical machinery to the single-phrase form with the
    * phrase id carried through the slot structs: still one explode, one
    * token IN-set filter over the union of all phrase tokens, one
    * `(id, phrase, start)` aggregation — cost grows with total
    * phrase-token OCCURRENCES, not with |phrases| × corpus.
    *
    * Output: (idCol, phrase_id, n_matches, first_pos) — phrase_id is
    * the 0-based index into `phrases`; (doc, phrase) combinations with
    * no match emit no row.
    */
  def multiPhraseMatches(docs: DataFrame, idCol: String, textCol: String,
                         phrases: Seq[Seq[String]],
                         lowercase: Boolean = false): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    phrases.foreach { p =>
      require(p.nonEmpty, "phrase must have at least one token")
      require(p.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
        s"phrase tokens must be non-empty and whitespace-free: $p")
    }
    val ph = if (lowercase) phrases.map(_.map(_.toLowerCase)) else phrases
    val text = if (lowercase) lower(col(textCol)) else col(textCol)
    // (id, pos, token), 1-based positions over the raw split
    val postings = docs
      .select(col(idCol).as("id"), posexplode(split(text, " ")).as(Seq("pos0", "tok")))
      .select(col("id"), (col("pos0") + 1).as("pos"), col("tok"))
    // One lookup ROW per (phrase, slot): (tok, pid, idx, plen). The inner
    // broadcast join below is simultaneously the phrase-token filter (a
    // corpus token absent from every phrase matches no lookup row) and
    // the slot fan-out (a token filling several slots matches several) —
    // data, not expression tree, so N phrases never grow the plan.
    val lookup = docs.sparkSession.createDataFrame(
      ph.zipWithIndex.flatMap { case (p, pid) =>
        p.zipWithIndex.map { case (t, idx) => (t, pid, idx, p.size) }
      }).toDF("tok", "pid", "idx", "plen")
    val starts = postings
      .join(broadcast(lookup), "tok")
      .select(col("id"), col("pid"), (col("pos") - col("idx")).as("p0"),
        col("idx"), col("plen"))
      .filter(col("p0") >= 1)
    starts.groupBy("id", "pid", "p0")
      .agg(count_distinct(col("idx")).as("__slots"), first(col("plen")).as("__plen"))
      .filter(col("__slots") === col("__plen"))
      .groupBy("id", "pid")
      .agg(count(lit(1)).as("n_matches"), min(col("p0")).as("first_pos"))
      .select(col("id").as(idCol), col("pid").as("phrase_id"),
        col("n_matches"), col("first_pos"))
  }
}
