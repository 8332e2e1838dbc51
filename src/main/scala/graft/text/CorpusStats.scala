package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Per-document TF-IDF keyword extraction: the `topK` highest-scoring
    * terms of every document, `score = tf · (ln((N+1)/(df+1)) + 1)`
    * (smoothed idf — never negative, never divides by zero).
    *
    * Shape: one explode of the token stream feeds BOTH frequency tables —
    * per-doc tf by (id, token) and corpus df by token — as partial
    * aggregations; the df side re-aggregates the already-reduced tf rows
    * (|docs|·|distinct terms per doc|, not the raw token stream), the
    * corpus doc count joins as a broadcast 1-row frame, and the per-doc
    * top-k is a `row_number` window over `id` — a key whose cardinality
    * IS the corpus, so window parallelism tracks the cluster (the
    * Normalize low-cardinality-window lesson does not apply).
    *
    * Determinism: ranking compares the ROUNDed score (plus token as the
    * total tie-break), so the last-ulp difference between two engines'
    * `ln` cannot reorder the result; `tf`/`df` are exact integers.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("__n"))
    // the df table is vocab-sized (unbounded on web text: typos,
    // numbers) with a corrupted static estimate — guard the join
    // (r15 NearDup.mergeIfBig hazard); small corpora keep broadcasts
    val big = docs.count() > graft.dedup.NearDup.BroadcastSafeRows
    val scored = tf.join(graft.dedup.NearDup.mergeIfBig(dfreq, big), "token")
      .crossJoin(broadcast(nDocs))
      .select(col("id"), col("token"), col("tf"), col("df"),
        round(col("tf") * (log((col("__n") + lit(1)).cast("double")
          / (col("df") + lit(1))) + lit(1.0)), 6).as("tfidf"))
    val w = Window.partitionBy("id")
      .orderBy(col("tfidf").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .drop("rank")
  }

  /** Corpus-level bigram association mining: the `topN` most frequent
    * adjacent token pairs with their pointwise mutual information
    * `pmi = ln( p(xy) / (p(x)·p(y)) )` — the collocation-discovery /
    * tokenizer-merge-candidate query over a training corpus.
    *
    * Ranking is by the exact integer pair count (then the pair string),
    * never by the float pmi — so the result set is hash-stable across
    * engines and the pmi column is a ROUNDed report field. `minCount`
    * prunes the singleton-pair tail BEFORE the unigram joins (at web
    * scale the count-1 pair mass dominates; joining it would shuffle the
    * whole pair table twice for rows a threshold discards anyway). The
    * two unigram attachments are plain hash joins on the token — the
    * unigram table grows with the corpus, so no broadcast is assumed.
    */
  /** Per-document token-distribution entropy — the "compression ratio"
    * quality signal: near-zero entropy means the document repeats a few
    * tokens (boilerplate soup, keyword stuffing), maximal entropy
    * `ln(n_tokens)` means every token is distinct. Filter low-entropy
    * docs the way Gopher filters high `dup_ngram_frac`.
    *
    * Uses the identity `H = ln(n) − (Σ cnt·ln(cnt))/n` so the only
    * order-sensitive float work is the Σ term — which is micro-quantized
    * per DISTINCT token (`cnt · round(ln(cnt)·10⁶)`, exact integer
    * products) before the sum, making the aggregate partition-order
    * invariant and engine-replayable (NOTES.md fixed-point playbook).
    */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnts = docs
      .select(col(idCol).as("id"), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("id", "token").agg(count(lit(1)).as("cnt"))
    val perDoc = cnts.groupBy("id").agg(
      sum(col("cnt")).as("n_tokens"),
      sum(col("cnt") * round(log(col("cnt").cast("double")) * lit(1000000.0))
        .cast("long")).as("ent_micro"))
    perDoc.select(col("id"), col("n_tokens"), col("ent_micro"),
      round(log(col("n_tokens").cast("double"))
        - col("ent_micro") / lit(1000000.0) / col("n_tokens"), 6).as("entropy"))
  }

  /** Pairwise vocabulary overlap between sources — the corpus-mixture
    * diagnostic ("how redundant are my domains?") that decides merge /
    * reweight calls before training. Jaccard over each source's DISTINCT
    * token set, computed by one self-join of the (source, token) table
    * on the token: candidates per token are bounded by the number of
    * sources carrying it (≤ |sources|, a mixture has tens–hundreds),
    * never by corpus size — so the join output is |vocab| · O(pairs per
    * token), not documents².
    */
  def sourceVocabOverlap(docs: DataFrame, srcCol: String,
                         textCol: String): DataFrame = {
    val vocab = docs
      .select(col(srcCol).as("src"), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .distinct()
    val sizes = vocab.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = vocab.select(col("src").as("src_a"), col("token"))
      .join(vocab.select(col("src").as("src_b"), col("token")), "token")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("src").as("src_a"), col("n").as("__na")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n").as("__nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("__na").as("n_a"),
        col("__nb").as("n_b"), col("n_common"),
        round(col("n_common")
          / (col("__na") + col("__nb") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }

  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long, topN: Int): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col(textCol)).as("tk"))
    // lazy on purpose: the unigram table is consumed twice (w1 and w2
    // join sides) but the identical explode+count subchains share their
    // shuffle via ReusedExchange at runtime (round-13 plan audit) — a
    // pin would only serialize an extra job
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("uc"))
    val bi = toks
      .select(Decontaminate.ngramsFromTokens(col("tk"), 2).as("g"))
      .select(explode(col("g")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
      .withColumn("w1", split_part(col("pair"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("pair"), lit(" "), lit(2)))
    val totals = toks.agg(
      sum(size(col("tk"))).cast("long").as("__t"),
      sum(greatest(size(col("tk")) - 1, lit(0))).cast("long").as("__tb"))
    val u1 = uni.select(col("w").as("w1"), col("uc").as("c1"))
    val u2 = uni.select(col("w").as("w2"), col("uc").as("c2"))
    // ratio computed in double throughout: the integer products overflow
    // BIGINT at corpus scale (T² alone is ~10²⁴ for a trillion-token
    // corpus); identical left-associated double arithmetic on the oracle
    // side replays the value bit-for-bit before the shared ROUND
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    // the unigram table grows with the corpus — the scaladoc's "no
    // broadcast is assumed" is ENFORCED against the static-estimate lie
    // (r15 NearDup.mergeIfBig hazard)
    val big = docs.count() > graft.dedup.NearDup.BroadcastSafeRows
    bi.join(graft.dedup.NearDup.mergeIfBig(u1, big), "w1")
      .join(graft.dedup.NearDup.mergeIfBig(u2, big), "w2")
      .crossJoin(broadcast(totals))
      .select(col("pair"), col("pair_count"), col("c1"), col("c2"),
        round(log(dbl(col("pair_count")) * dbl(col("__t")) * dbl(col("__t"))
          / (dbl(col("__tb")) * dbl(col("c1")) * dbl(col("c2")))), 6).as("pmi"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(topN)
  }

  /** Per-source distribution drift: KL(p_source ‖ p_corpus) over token
    * unigrams — the corpus-health diagnostic that catches a crawl shard
    * whose language mix silently changed, scored against the pooled
    * corpus as the baseline. No smoothing is needed: every token a
    * source emits exists in the pooled corpus by construction
    * (c_w ≥ c_sw ≥ 1), so the log ratio is always finite.
    *
    * KL = (1/N_s)·Σ_w c_sw·ln((c_sw·N)/(N_s·c_w)) — the per-token log
    * term is micro-quantized BEFORE the Σ (fixed-point idiom), the
    * weighted sum `Σ c_sw·q_micro` is BIGINT-exact, and only the final
    * report column divides back to a rounded double. One corpus scan:
    * the (source, token) counts feed BOTH the per-token join side and
    * (via a second tiny aggregate over the vocab-sized table) the
    * token totals and source totals — no rescan of documents.
    *
    * Output: (source, n_tokens, kl_sum_micro, kl_nats).
    */
  def sourceKlDrift(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val st = docs
      .select(col(srcCol).as("source"),
              explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c_sw"))
    // vocab-sized table from here on — everything below is cheap
    val stM = st.localCheckpoint()
    val tokTotals = stM.groupBy("token").agg(sum(col("c_sw")).as("c_w"))
    val srcTotals = stM.groupBy("source").agg(sum(col("c_sw")).as("n_s"))
    val grand = tokTotals.agg(sum(col("c_w")).as("n_all"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    stM.join(tokTotals, Seq("token"))
      .join(broadcast(srcTotals), Seq("source"))
      .crossJoin(broadcast(grand))
      .withColumn("q_micro",
        round(log(dbl(col("c_sw")) * dbl(col("n_all"))
          / (dbl(col("n_s")) * dbl(col("c_w")))) * 1000000.0).cast("long"))
      .groupBy("source")
      .agg(sum(col("c_sw")).as("n_tokens"),
           sum(col("c_sw") * col("q_micro")).as("kl_sum_micro"))
      .withColumn("kl_nats",
        round(col("kl_sum_micro") / col("n_tokens") / 1000000.0, 6))
  }
}
