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
    val allTokens = ph.flatten.distinct
    // (id, pos, token), 1-based positions over the raw split
    val postings = docs
      .select(col(idCol).as("id"), posexplode(split(text, " ")).as(Seq("pos0", "tok")))
      .select(col("id"), (col("pos0") + 1).as("pos"), col("tok"))
      .filter(col("tok").isin(allTokens: _*))
    // every (phrase, slot) this token witnesses -> candidate starts
    val slotsFor: Map[String, Seq[(Int, Int)]] =
      ph.zipWithIndex.flatMap { case (p, pid) =>
        p.zipWithIndex.map { case (t, idx) => t -> (pid, idx) }
      }.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val slotExpr = allTokens.foldLeft(
      lit(null).cast("array<struct<pid:int,idx:int>>")) { (acc, t) =>
      when(col("tok") === t, array(slotsFor(t).map { case (pid, idx) =>
        struct(lit(pid).as("pid"), lit(idx).as("idx"))
      }: _*)).otherwise(acc)
    }
    val phraseLens = array(ph.map(p => lit(p.size)): _*)
    val starts = postings
      .select(col("id"), col("pos"), explode(slotExpr).as("s"))
      .select(col("id"), col("s.pid").as("pid"),
        (col("pos") - col("s.idx")).as("p0"), col("s.idx").as("idx"))
      .filter(col("p0") >= 1)
    starts.groupBy("id", "pid", "p0")
      .agg(count_distinct(col("idx")).as("__slots"))
      .filter(col("__slots") === element_at(phraseLens, col("pid") + 1))
      .groupBy("id", "pid")
      .agg(count(lit(1)).as("n_matches"), min(col("p0")).as("first_pos"))
      .select(col("id").as(idCol), col("pid").as("phrase_id"),
        col("n_matches"), col("first_pos"))
  }
}
