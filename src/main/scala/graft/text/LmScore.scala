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
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("tk"))
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
