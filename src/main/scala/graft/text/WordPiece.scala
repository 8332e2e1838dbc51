package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Schuster & Nakajima 2012; the BERT tokenizer
  * family — public) as the second tokenizer family next to
  * [[graft.text.Bpe]]: greedy LONGEST-MATCH-FIRST segmentation of each
  * word against a piece vocabulary, word-internal continuation pieces
  * carrying the `##` prefix, and whole-word `[UNK]` fallback when any
  * position fails to match (the BERT rule — no partial words).
  *
  * Scale shape (100 TB): everything iterative runs on the DISTINCT-WORD
  * vocabulary, never the corpus — the corpus pays ONE token explode, a
  * word-keyed join against the (word → pieces) result (word-vocabulary
  * sized, AQE-broadcastable), and one per-doc aggregation. The greedy
  * match loop is `maxWordLen` rounds (each round consumes ≥1 character
  * of every still-active word) of vocab-keyed joins over the shrinking
  * active-word set, with the model-sized state localCheckpointed per
  * round (the [[Bpe.train]] discipline — the loop never re-derives its
  * input chain). Every step is deterministic string arithmetic: the
  * whole loop is replayed round-for-round by the DuckDB oracle
  * ([[graft.SparkEntry]] chained CTEs).
  */
object WordPiece {

  /** A deterministic corpus-derived piece vocabulary: ALL word-initial
    * single characters and all continuation single characters (coverage
    * — no in-corpus word can go [UNK]), plus every word-initial prefix
    * of length 2..`maxPrefix` and every continuation bigram whose
    * occurrence-weighted corpus count reaches `minCount` (thresholds,
    * not top-k: no rank ties to break). Output: (piece, plen) where
    * `plen` is the match length (the `##` marker excluded).
    *
    * One corpus explode; every aggregation after it is word-vocabulary
    * sized.
    */
  def vocab(docs: DataFrame, idCol: String, textCol: String,
            maxPrefix: Int = 4, minCount: Long = 50L): DataFrame = {
    require(maxPrefix >= 2, s"maxPrefix=$maxPrefix — the prefix tier " +
      "starts at length 2 (singles are unconditional coverage)")
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val initSingles = words
      .select(substring(col("word"), 1, 1).as("piece")).distinct()
      .withColumn("plen", lit(1))
    val sufSingles = words
      .filter(length(col("word")) >= 2)
      .select(col("word"), explode(sequence(lit(2), length(col("word")))).as("p"))
      .select(concat(lit("##"), col("word").substr(col("p"), lit(1))).as("piece"))
      .distinct()
      .withColumn("plen", lit(1))
    val initPrefixes = (2 to maxPrefix).map { l =>
      words.filter(length(col("word")) >= l)
        .groupBy(substring(col("word"), 1, l).as("piece"))
        .agg(sum(col("cnt")).as("c"))
        .filter(col("c") >= minCount)
        .select(col("piece"), lit(l).as("plen"))
    }.reduce(_ unionByName _)
    val sufBigrams = words
      .filter(length(col("word")) >= 3)
      .select(col("word"), col("cnt"),
        explode(sequence(lit(2), length(col("word")) - 1)).as("p"))
      .groupBy(concat(lit("##"), col("word").substr(col("p"), lit(2))).as("piece"))
      .agg(sum(col("cnt")).as("c"))
      .filter(col("c") >= minCount)
      .select(col("piece"), lit(2).as("plen"))
    initSingles.unionByName(sufSingles)
      .unionByName(initPrefixes).unionByName(sufBigrams)
      .distinct()
  }

  /** The candidate piece text at (word, pos) for a given length. */
  private def pieceAt(pos: Column, plen: Column): Column =
    when(pos === 1, col("word").substr(pos, plen))
      .otherwise(concat(lit("##"), col("word").substr(pos, plen)))

  /** Greedy longest-match encode of a DISTINCT word set against a
    * [[vocab]] table: (word, pieces, n_pieces) where `pieces` is the
    * space-joined piece sequence or the literal `[UNK]` (whole-word
    * fallback, BERT semantics — also taken by words longer than
    * `maxWordLen`, which bounds the loop). `maxWordLen` rounds suffice
    * because every round consumes at least one character of every
    * active word.
    */
  def encodeWords(words: DataFrame, vocabDf: DataFrame,
                  maxWordLen: Int = 16): DataFrame = {
    // vocab-sized pin, ONCE before the loop: every round broadcasts the
    // vocabulary, and each round is its own action (the state pin), so
    // without this the whole corpus-derivation chain behind `vocabDf`
    // re-executes per round — ReusedExchange cannot span actions.
    // Measured at 100×: 251 s unpinned → BASELINE round-13 row pinned.
    val v = broadcast(vocabDf.select(col("piece"), col("plen")).localCheckpoint())
    val init = words.select(col("word")).distinct()
      .withColumn("pos", lit(1))
      .withColumn("pieces", lit(""))
      .withColumn("unk", length(col("word")) > maxWordLen)
      .withColumn("done", col("unk") || length(col("word")) === 0)
      .withColumn("pieces", when(col("unk"), lit("[UNK]")).otherwise(col("pieces")))
      .localCheckpoint()
    // loop bound: the corpus's actual longest admissible word (each
    // round consumes ≥1 character of every active word), and ONLY the
    // still-active set is re-pinned per round — finished rows stay lazy
    // one short join off their round's checkpoint (re-pinning the full
    // state is O(rounds²) materialization; the graft.text.Unigram
    // lesson, back-ported)
    val maxLen = math.min(maxWordLen,
      init.filter(!col("done"))
        .agg(coalesce(max(length(col("word"))), lit(0))).head.getInt(0))
    var active = init.filter(!col("done")).localCheckpoint()
    val doneSlices = scala.collection.mutable.ArrayBuffer(init.filter(col("done")))
    for (_ <- 1 to maxLen) {
      val best = active
        .join(v, (col("pos") + col("plen") - 1 <= length(col("word"))) &&
          (col("piece") === pieceAt(col("pos"), col("plen"))))
        .groupBy("word", "pos", "pieces").agg(max(col("plen")).as("bl"))
      val appended = when(col("pieces") === "", pieceAt(col("pos"), col("bl")))
        .otherwise(concat(col("pieces"), lit(" "), pieceAt(col("pos"), col("bl"))))
      val next = active.join(best, Seq("word", "pos", "pieces"), "left")
        .select(col("word"),
          (col("pos") + coalesce(col("bl"), lit(0))).as("pos"),
          when(col("bl").isNull, lit("[UNK]")).otherwise(appended).as("pieces"),
          col("bl").isNull.as("unk"))
        .withColumn("done", col("unk") || col("pos") > length(col("word")))
        .select("word", "pos", "pieces", "unk", "done")
        .localCheckpoint() // one active-set-sized pin per round; both
                           // splits below are narrow filters over it
      doneSlices += next.filter(col("done"))
      active = next.filter(!col("done"))
    }
    // ONE final pin: the result is otherwise a ~maxLen-way union of
    // filters whose per-slice stages re-schedule on EVERY consuming
    // action (measured +3.6 s at 100× when left lazy under the
    // broadcast build)
    val state = (doneSlices :+ active).reduce(_ unionByName _).localCheckpoint()
    state.select(col("word"), col("pieces"),
      size(split(col("pieces"), " ")).cast("long").as("n_pieces"))
  }

  /** Per-document WordPiece encode: (id, n_words, n_pieces, wp_text)
    * with `wp_text` the in-order piece stream of the whole document.
    * The corpus pays one positional explode + a distinct-word-sized
    * join + one per-doc aggregation; all greedy-match iteration cost
    * sits on the word vocabulary ([[encodeWords]]).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocabDf: DataFrame, maxWordLen: Int = 16): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("idx", "word")))
      .filter(length(col("word")) > 0)
    val enc = encodeWords(toks.select("word"), vocabDf, maxWordLen)
    // explicit build side: enc is word-vocabulary-sized, but its
    // checkpoint-backed stats are opaque enough that the planner once
    // picked BuildLeft — broadcasting the EXPLODED CORPUS (110 s at
    // 100×; see the BASELINE round-13 row for the hinted cost)
    toks.join(broadcast(enc), "word")
      .groupBy("id").agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("pieces")))),
          x => x.getField("pieces")), " ").as("wp_text"))
  }
}
