package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM tokenization (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram model; public) as the THIRD tokenizer family
  * next to [[Bpe]] (merge-based) and [[WordPiece]] (greedy longest
  * prefix): each word takes the segmentation MAXIMIZING the sum of
  * per-piece log-probabilities — Viterbi dynamic programming over the
  * piece lattice, not a greedy scan. Where BPE/WordPiece commit to a
  * local choice, unigram picks the globally best split under the model,
  * which is why SentencePiece ships it as the quality-default.
  *
  * Deliberate, documented deviation from Kudo's full recipe: the piece
  * probabilities come from ONE frequency pass (occurrence-weighted
  * substring counts, threshold-kept), not iterated EM — the same
  * determinism trade [[WordPiece.vocab]] makes (thresholds, not top-k:
  * no rank ties to break; no float EM state to replay). The
  * SEGMENTATION algorithm — the part users run per-corpus — is the
  * published Viterbi, exact.
  *
  * Determinism contract: piece scores are micro-quantized
  * (`round(ln(c/total)·1e6)` — the [[LmScore]]/[[NaiveBayes]]
  * convention), so every lattice value is an exact integer; the DP
  * argmax at each end-position packs (candidate value, previous
  * position) into ONE integer key `value·16 + prev_pos`
  * (prev_pos < 16), so "max score, tie → shortest last piece" is a
  * plain MAX — bit-stable at any parallelism and replayed key-for-key
  * by the DuckDB oracle's unrolled CTE chain.
  *
  * Scale shape (100 TB): the corpus pays ONE token explode for word
  * counts, one substring fan-out (≤ maxWordLen·maxPieceLen per distinct
  * word, in-scan), and at encode time one word-keyed join of the
  * (word → segmentation) table back to the token stream
  * (word-vocabulary sized, explicitly broadcast — the
  * [[WordPiece.encode]] build-side lesson) plus one per-doc
  * aggregation. ALL Viterbi iteration runs on the DISTINCT-WORD set:
  * `maxWordLen` forward rounds + `maxWordLen` backward rounds of
  * vocab-keyed joins over word-sized tables, each pinned model-sized
  * per round (the [[Bpe.train]] discipline).
  */
object Unigram {

  /** Max characters per vocabulary piece (the lattice edge length). */
  val MaxPieceLen = 6

  /** Words longer than this take the whole-word OOV fallback (bounds
    * both DP loops; the [[WordPiece.encodeWords]] convention).
    */
  val MaxWordLen = 16

  /** Fixed OOV piece score in micro-units (SentencePiece's fixed unk
    * penalty, kept clear of any in-vocab score so OOV never outranks a
    * real segmentation).
    */
  val UnkScoreMicro: Long = -25000000L

  /** Frequency-seeded piece vocabulary: every substring of length
    * 1..[[MaxPieceLen]] of every distinct word, occurrence-weighted;
    * single characters kept unconditionally (coverage — every in-corpus
    * word of admissible length segments), longer pieces kept at
    * `c >= minCount`. Returns (piece, plen, c, score_micro) with
    * `score_micro = round(ln(c / total)·1e6)`, `total` summed over the
    * KEPT pieces (the vocabulary is the probability model).
    *
    * One corpus explode; the substring fan-out and everything after it
    * is distinct-word sized.
    */
  def vocab(docs: DataFrame, idCol: String, textCol: String,
            minCount: Long = 50L): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    val words = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val subs = words
      .select(col("word"), col("cnt"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("word"), col("cnt"), col("p"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("p") + 1))).as("l"))
      .groupBy(col("word").substr(col("p"), col("l")).as("piece"),
        col("l").as("plen"))
      .agg(sum(col("cnt")).as("c"))
    val kept = subs.filter(col("plen") === 1 || col("c") >= minCount)
    val tot = kept.agg(sum(col("c")).as("t"))
    kept.crossJoin(broadcast(tot))
      .select(col("piece"), col("plen").cast("int").as("plen"), col("c"),
        round(log(col("c").cast("double") / col("t").cast("double")) * 1e6)
          .cast("long").as("score_micro"))
  }

  /** Pack a lattice candidate into the argmax key: `value·16 + prevPos`
    * — value differences dominate (≥16 apart after scaling), equal
    * values fall to the LARGEST previous position (shortest last
    * piece). Unpack via canonical non-negative mod (identical under
    * Spark's and DuckDB's truncating `%`).
    */
  private val KeySlots = 16L

  /** Viterbi-encode a DISTINCT word set against a [[vocab]] table:
    * (word, seg, n_pieces, score_micro) where `seg` is the space-joined
    * max-probability piece sequence. Words longer than [[MaxWordLen]]
    * (or empty) take the whole-word OOV row at [[UnkScoreMicro]].
    *
    * Forward pass: `best(word, pos)` holds the packed
    * (best value · 16 + backpointer) for each prefix length; round j
    * maxes over previous positions j−[[MaxPieceLen]]..j−1 joined to the
    * vocabulary on the exact candidate substring. Backward pass walks
    * the stored backpointers — no per-step argmax, so the
    * reconstruction is a pure join loop.
    */
  /** Sentinel lattice value for unreachable positions in the fused DP
    * (see [[encodeWords]]): far below any real packed score — a real
    * lattice value is bounded below by MaxWordLen pieces at the worst
    * admissible per-piece score, orders of magnitude above this — and
    * far above Long overflow even after MaxWordLen sentinel-derived
    * hops (each hop moves the value by ≤ 16·score + 15, ~10¹⁰).
    * Reachability is decided against [[UnreachFloor]], the midpoint.
    */
  private val Unreach: Long = Long.MinValue / 4
  private val UnreachFloor: Long = Long.MinValue / 8

  def encodeWords(words: DataFrame, vocabDf: DataFrame): DataFrame = {
    // vocab-sized pin ONCE before the lattice join (the round-loop form
    // of this function needed it per round; the fused form still wants
    // true stats under the broadcast)
    val v = broadcast(
      vocabDf.select(col("piece"), col("plen"), col("score_micro"))
        .localCheckpoint())
    val dw = words.select(col("word")).distinct()
      .filter(length(col("word")) > 0)
      .localCheckpoint()
    val inRange = dw.filter(length(col("word")) <= MaxWordLen)

    // Fused Viterbi: the whole per-word DP is LOCAL once the in-vocab
    // lattice edges are known, so run it as ONE vocab join + ONE
    // per-word aggregation + ONE fold expression, instead of
    // 2·MaxWordLen rounds of vocab-keyed joins each pinned by its own
    // action (32+ scheduler round-trips per call — the dominant cost of
    // every unigram row at bench scale, and 30 extra stage launches per
    // call at any scale; guide §1.2 step 1). The integer law is
    // UNCHANGED and oracle-pinned: candidate key = (s_prev + score)·16
    // + prev_pos, per-position argmax = plain MAX over packed keys,
    // unpack via canonical mod; ties fall to the largest prev_pos
    // (shortest last piece) exactly as before.
    //
    // Edges: (end pos j = p + l, start pos p, score) for every in-vocab
    // substring — ≤ MaxWordLen·MaxPieceLen candidates per word pre-join.
    val cand = inRange
      .select(col("word"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("p"))
      .select(col("word"), col("p"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("p")))).as("l"))
      .join(v, col("plen") === col("l") &&
        col("piece") === expr("substring(word, p + 1, l)"))
      .select(col("word"),
        struct((col("p") + col("l")).cast("int").as("j"),
          col("p").cast("int").as("p"),
          col("score_micro").as("sc")).as("edge"))
    // sort by end position: every edge's source slot is final when the
    // edge folds (all edges into p have end position p < j)
    val lattice = cand.groupBy("word")
      .agg(sort_array(collect_list(col("edge"))).as("edges"))

    // forward fold: slot k of the accumulator holds the packed best key
    // of prefix length k (slot 0 = the empty prefix, s = 0); KeySlots is
    // 16 = 2^4, so unpack-divide is an arithmetic shift (exact — the
    // packed value minus its canonical mod is divisible by 16).
    val init = array(lit(0L) +: Seq.fill(MaxWordLen)(lit(Unreach)): _*)
    val folded = lattice.select(col("word"),
      aggregate(col("edges"), init, (acc, e) => {
        val sPrev = shiftright(element_at(acc, e.getField("p") + 1), 4)
        val cnd = (sPrev + e.getField("sc")) * lit(KeySlots) +
          e.getField("p").cast("long")
        transform(sequence(lit(0), lit(MaxWordLen)), i =>
          when(i === e.getField("j"), greatest(element_at(acc, i + 1), cnd))
            .otherwise(element_at(acc, i + 1)))
      }).as("lat"))

    // backward walk over the stored backpointers, prepending pieces —
    // the same ≤ MaxWordLen steps, folded into one expression. Words
    // whose full-length slot is unreachable are DROPPED (unsegmentable
    // under this vocab — the round-loop form dropped them via its inner
    // score join).
    val wlen = length(col("word")).cast("int")
    val finalKey = element_at(col("lat"), wlen + 1)
    val walk = aggregate(sequence(lit(1), lit(MaxWordLen)),
      struct(wlen.as("pos"), lit("").as("seg"), lit(0L).as("n")),
      (st, _) => {
        val pos = st.getField("pos")
        val bp = pmod(element_at(col("lat"), pos + 1), lit(KeySlots)).cast("int")
        when(pos <= 0, st).otherwise(struct(
          bp.as("pos"),
          concat(col("word").substr(bp + 1, pos - bp),
            when(st.getField("seg") === "", lit(""))
              .otherwise(concat(lit(" "), st.getField("seg")))).as("seg"),
          (st.getField("n") + 1).as("n")))
      })
    val segmented = folded
      .filter(finalKey > lit(UnreachFloor))
      .select(col("word"), walk.as("w"), shiftright(finalKey, 4).as("score_micro"))
      .select(col("word"), col("w").getField("seg").as("seg"),
        col("w").getField("n").as("n_pieces"), col("score_micro"))

    val oov = dw.filter(length(col("word")) > MaxWordLen)
      .select(col("word"), col("word").as("seg"), lit(1L).as("n_pieces"),
        lit(UnkScoreMicro).as("score_micro"))
    // ONE final pin: checkpoint-backed true stats for the broadcast
    // consumers ([[encode]]'s explicit build side), same as before
    segmented.unionByName(oov).localCheckpoint()
  }

  /** Viterbi-EM vocabulary refinement (the hard-EM variant of Kudo
    * 2018's EM training loop: commit to the argmax segmentation under
    * the current model, recount piece usage from those segmentations,
    * re-score — published as Viterbi/hard EM; the soft-EM
    * forward–backward would put log-sum-exp floats in every lattice
    * node, which the determinism contract forbids). Per iteration:
    *
    *  1. Viterbi-segment the distinct words under the current scores
    *     ([[encodeWords]] — integer lattice, replayable);
    *  2. usage count per piece = occurrence-weighted count over the
    *     chosen segmentations (words carry their corpus counts);
    *  3. pieces with zero usage are PRUNED (the EM prune), except
    *     single characters, which are floor-counted at 1 — coverage
    *     must survive refinement or a word goes unsegmentable;
    *  4. scores re-quantized: round(ln(c / total)·1e6) over the new
    *     kept mass.
    *
    * Scale shape: ONE corpus pass for the word counts (pinned before
    * the loop); every iteration is distinct-word-sized (a Viterbi
    * encode + two small aggregations). Returns the refined
    * (piece, plen, c, score_micro) table.
    */
  def refineVocab(docs: DataFrame, idCol: String, textCol: String,
                  baseVocab: DataFrame, iters: Int = 1): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val wc = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // the one corpus pass, paid once
    val singles = wc
      .select(col("word"), explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("word").substr(col("p"), lit(1)).as("piece")).distinct()
    var v = baseVocab
    for (_ <- 1 to iters) {
      // OOV whole-word fallbacks (len > MaxWordLen) are words, not
      // model pieces — exclude them from the recount (seg == word AND
      // beyond piece length bounds anyway via the explode filter below)
      val usage = encodeWords(wc.select("word"), v)
        .filter(length(col("word")) <= MaxWordLen)
        .join(wc, "word")
        .select(col("cnt"), explode(split(col("seg"), " ")).as("piece"))
        .groupBy("piece").agg(sum(col("cnt")).as("u"))
      val kept = singles.join(usage, Seq("piece"), "left")
        .select(col("piece"), greatest(coalesce(col("u"), lit(0L)), lit(1L)).as("c"))
        .unionByName(
          usage.filter(length(col("piece")) > 1)
            .select(col("piece"), col("u").as("c")))
      val tot = kept.agg(sum(col("c")).as("t"))
      v = kept.crossJoin(broadcast(tot))
        .select(col("piece"), length(col("piece")).cast("int").as("plen"), col("c"),
          round(log(col("c").cast("double") / col("t").cast("double")) * 1e6)
            .cast("long").as("score_micro"))
    }
    v
  }

  /** Per-document unigram encode: (id, n_words, n_pieces, score_micro,
    * ug_text) — the in-order max-probability piece stream of the whole
    * document plus its total unigram-LM score. The corpus pays one
    * positional explode, one broadcast join against the word-sized
    * segmentation table, and one per-doc aggregation.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocabDf: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("idx", "word")))
      .filter(length(col("word")) > 0)
    val enc = encodeWords(toks.select("word"), vocabDf)
    // explicit build side: enc is word-vocabulary-sized but
    // checkpoint-backed (opaque stats — the [[WordPiece.encode]]
    // 60M-row-broadcast lesson)
    toks.join(broadcast(enc), "word")
      .groupBy("id").agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(col("score_micro")).as("score_micro"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("seg")))),
          x => x.getField("seg")), " ").as("ug_text"))
  }
}
