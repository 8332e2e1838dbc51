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
    // vocab-sized pin, ONCE before the match join (the round-loop form
    // of this function needed it per round; the fused form still wants
    // true stats under the broadcast). Measured at 100×: 251 s unpinned
    // → BASELINE round-13 row pinned. The broadcast hint sits on the
    // JOIN below, not on this frame: `v` also feeds the maxPlen
    // aggregate, where a frame-level hint dangles (HintErrorLogger
    // noise on every encode — the r17 verdict-#4 class).
    val v = vocabDf.select(col("piece"), col("plen")).localCheckpoint()
    val dw = words.select(col("word")).distinct().localCheckpoint()
    // Fused greedy walk: longest-match-first is LOCAL per word once the
    // per-position longest in-vocab match is known, so run it as ONE
    // vocab join + ONE per-word aggregation + ONE fold expression,
    // instead of maxWordLen rounds of vocab-keyed joins each pinned by
    // its own action (~2·maxWordLen scheduler round-trips per call —
    // the dominant cost of the wordpiece rows at bench scale; guide
    // §1.2 step 1). Semantics unchanged and oracle-pinned: at each
    // position take the LONGEST matching piece ([UNK] whole-word on any
    // miss; words longer than maxWordLen are [UNK] up front).
    val maxPlen = v.agg(coalesce(max(col("plen")), lit(1))).head.getInt(0)
    val inRange = dw.filter(length(col("word")) <= maxWordLen &&
      length(col("word")) > 0)
    // longest in-vocab match per (word, pos): the only fact the greedy
    // walk consults
    val best = inRange
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("pos"),
        explode(sequence(lit(1),
          least(lit(maxPlen), length(col("word")) - col("pos") + 1))).as("l"))
      .join(broadcast(v), col("plen") === col("l") &&
        col("piece") === pieceAt(col("pos"), col("l")))
      .groupBy("word", "pos").agg(max(col("plen")).as("bl"))
    val matches = best.groupBy("word")
      .agg(map_from_entries(collect_list(struct(col("pos"), col("bl")))).as("m"))
    // left join: words with no match anywhere still need their [UNK] row
    val joined = inRange.join(matches, Seq("word"), "left")
    val wlen = length(col("word")).cast("int")
    // walk: ≤ maxWordLen steps, each consuming bl ≥ 1 characters; a
    // missing entry at the current position is the whole-word [UNK]
    val walk = aggregate(sequence(lit(1), lit(maxWordLen)),
      struct(lit(1).as("pos"), lit("").as("pieces"), lit(false).as("unk")),
      (st, _) => {
        val pos = st.getField("pos")
        val bl = try_element_at(col("m"), pos)
        val appended = when(st.getField("pieces") === "", pieceAt(pos, bl))
          .otherwise(concat(st.getField("pieces"), lit(" "), pieceAt(pos, bl)))
        when(st.getField("unk") || pos > wlen, st)
          .otherwise(when(bl.isNull,
            struct(pos.as("pos"), lit("[UNK]").as("pieces"), lit(true).as("unk")))
          .otherwise(struct((pos + bl).as("pos"), appended.as("pieces"),
            lit(false).as("unk"))))
      })
    val walked = joined.select(col("word"),
      walk.getField("pieces").as("pieces"))
    val outRange = dw
      .filter(length(col("word")) > maxWordLen || length(col("word")) === 0)
      .select(col("word"),
        when(length(col("word")) > maxWordLen, lit("[UNK]")).otherwise(lit(""))
          .as("pieces"))
    // ONE final pin: checkpoint-backed true stats for the broadcast
    // consumers ([[encode]]'s explicit build side), same as before
    val state = walked.unionByName(outRange).localCheckpoint()
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
