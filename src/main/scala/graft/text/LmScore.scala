package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model quality scoring — the KenLM-perplexity
  * filter of CCNet/RedPajama-style pipelines, re-expressed with a model
  * the engine can train in-pass: an add-one-smoothed token-bigram LM
  * fitted on the corpus itself, scoring each document by its mean
  * per-bigram log-probability. Documents whose token transitions are
  * unlike the corpus (gibberish, wrong-language, boilerplate soup) score
  * low and can be gated on `avg_logprob`.
  *
  * Determinism contract (NOTES.md fixed-point playbook): each bigram's
  * log-probability is quantized to micro-units
  * (`CAST(ROUND(ln((c12+1)/(c1+V)) · 1e6) AS BIGINT)`) BEFORE the per-doc
  * sum, so the aggregate is an exact integer in any partition-merge
  * order; the reported mean divides the exact sum back out. Counts
  * c12/c1/V are exact integers; the ratio is one IEEE divide; ln is the
  * only library call and sits behind the 1e-6 quantizer.
  *
  * Scale shape: one explode of the token stream feeds both count tables
  * as partial aggregations (map-side combine on narrow rows); the vocab
  * size joins as a broadcast 1-row frame; scoring joins hash on the pair
  * and the leading token — both keys with corpus-scale cardinality. No
  * collect, no cross join, no per-row model state.
  */
object LmScore {

  /** Score every document: (id, n_pairs, lp_micro, avg_logprob) —
    * `lp_micro` the exact micro-unit log-prob sum, `avg_logprob` its
    * ROUNDed mean (NULL for documents with fewer than two tokens:
    * a bigram model has no evidence about them either way).
    */
  /** Interpolated Kneser-Ney bigram scoring — the smoothing family the
    * real perplexity filters use (KenLM's default; Kneser & Ney 1995,
    * Chen & Goodman 1998): instead of add-one's uniform mass,
    * `P(w2|w1) = max(c12 − d, 0)/c1 + λ(w1)·P_cont(w2)` with
    * `λ(w1) = d·N1+(w1·)/c1` and the continuation probability
    * `P_cont(w2) = N1+(·w2)/N1+(··)` — "how many contexts does w2
    * follow" rather than "how often does w2 occur", which is what makes
    * KN the strong baseline.
    *
    * Determinism: all counts (c12, history totals, distinct-continuation
    * and distinct-context counts, total bigram types) are exact
    * integers; `d` defaults to 0.75 (binary-exact); the probability is
    * ONE fixed shape of IEEE divides/multiply/add evaluated identically
    * by any engine, and the log sits behind the micro-unit quantizer
    * like [[bigramLogProb]]. `c1` is the HISTORY count Σ_w c(w1 w) (the
    * bigram-table-consistent convention), so every observed pair has
    * c1 ≥ c12 ≥ 1 and the formula never divides by zero.
    *
    * Scale shape: one explode feeds the bigram count table; history,
    * continuation and type counts are three narrow re-aggregations of
    * that (vocabulary-sized) table, NOT of the corpus; scoring joins
    * hash on pair/w1/w2 and the 1-row type total broadcasts.
    */
  def knBigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount=$discount out of (0,1)")
    val d = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("tk"))
    // Score per DISTINCT (doc, bigram) with an occurrence count, never
    // per occurrence: the raw exploded stream is aggregated once into
    // perDocPair, the whole count model (bi → hist/cont/N) and the
    // per-pair score are derived from model-sized tables, and the only
    // data-sized join is perDocPair ⋈ (pair, q). The first-shipped form
    // joined the RAW occurrence stream through a 3-join cascade
    // (156.9 s at 100×) and pinning that stream made it worse (186.3 s
    // — the pin writes dominate); this shape reads 60.7 s on the same
    // fixture (2.6×). perDocPair is pinned because every model
    // aggregate hangs off it — it is occurrence-deduplicated, so the
    // pin is bounded by doc-distinct bigram types, not corpus length.
    val pairs = d.select(col("id"),
      explode(Decontaminate.ngramsFromTokens(col("tk"), 2)).as("pair"))
    val perDocPair = pairs.groupBy("id", "pair")
      .agg(count(lit(1)).as("__occ")).localCheckpoint()
    val bi = perDocPair.groupBy("pair").agg(sum(col("__occ")).as("c12"))
      .withColumn("w1", split_part(col("pair"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("pair"), lit(" "), lit(2)))
      .localCheckpoint() // model-sized; consumed by 4 aggregates below
    val hist = bi.groupBy("w1").agg(
      sum(col("c12")).as("c1"), count(lit(1)).as("n1fw"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("nw2"))
    val nbi = bi.agg(count(lit(1)).as("__nb"))
    val qmodel = bi
      .join(hist, "w1").join(cont, "w2")
      .crossJoin(broadcast(nbi))
      .withColumn("q", round(log(
        greatest(col("c12").cast("double") - lit(discount), lit(0.0))
          / col("c1").cast("double")
          + lit(discount) * col("n1fw").cast("double") / col("c1").cast("double")
            * (col("nw2").cast("double") / col("__nb").cast("double"))
      ) * lit(1000000.0)).cast("long"))
      .select("pair", "q")
    val perDoc = perDocPair.join(qmodel, "pair")
      .groupBy("id").agg(
        sum(col("__occ")).as("n_pairs"),
        sum(col("__occ") * col("q")).as("lp_micro"))
    d.select(col("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("lp_micro"), lit(0L)).as("lp_micro"),
        when(coalesce(col("n_pairs"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(round(col("lp_micro") / col("n_pairs") / lit(1000000.0), 6))
          .as("avg_logprob"))
  }

  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("tk"))
    // Deliberately LAZY and single-join (round-13 negative result):
    // applying the [[knBigramLogProb]] per-(doc,pair) restructure here —
    // perDocPair + uni pins, model-sized scoring joins — measured
    // 24.6 → 81.5 s at 100× (3.3× LOSS). KN's win came from collapsing a
    // 3-join occurrence cascade; this form has ONE occurrence-level hash
    // join, so the pins only added serial materialization jobs in front
    // of it. The plan audit's 5 documents scans collapse at runtime:
    // the identical aggregation subchains share their shuffle output
    // via ReusedExchange (NOTES.md round-13 audit).
    val uni = d.select(explode(col("tk")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val pairs = d.select(col("id"),
      explode(Decontaminate.ngramsFromTokens(col("tk"), 2)).as("pair"))
    val bi = pairs.groupBy("pair").agg(count(lit(1)).as("c12"))
    val scored = pairs.join(bi, "pair")
      .withColumn("w1", split_part(col("pair"), lit(" "), lit(1)))
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("q", round(log((col("c12") + 1).cast("double")
        / (col("c1") + col("__v")).cast("double")) * lit(1000000.0)).cast("long"))
    val perDoc = scored.groupBy("id").agg(
      count(lit(1)).as("n_pairs"), sum(col("q")).as("lp_micro"))
    d.select(col("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("lp_micro"), lit(0L)).as("lp_micro"),
        when(coalesce(col("n_pairs"), lit(0L)) === 0, lit(null).cast("double"))
          .otherwise(round(col("lp_micro") / col("n_pairs") / lit(1000000.0), 6))
          .as("avg_logprob"))
  }
}
