package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the one-pass, closed-form
  * member of the linear-classifier family ([[LinearModel]] is the
  * iterated member): class-conditional token log-probabilities with
  * add-one smoothing, trained by ONE aggregation over the exploded
  * token stream. On near-template corpora where the full-batch
  * perceptron oscillates (synchronized count-magnitude updates
  * overshoot), NB's closed form has no dynamics to oscillate — it is
  * the classic high-accuracy baseline for token-presence signals.
  *
  * Determinism contract (NOTES.md fixed-point playbook, the
  * [[LmScore]] convention): every log-probability is quantized to
  * micro-units (`CAST(ROUND(ln(ratio) · 1e6) AS BIGINT)`) before any
  * sum, so per-document class scores are exact integer aggregates in
  * any partition order; counts, vocab size and class totals are exact
  * integers; `ln` is the only library call and sits behind the 1e-6
  * quantizer. Prediction compares the two integer scores.
  *
  * Scale shape (100 TB): training is one explode + one (token, class)
  * count — map-side combinable, vocabulary-sized output. The model is
  * a vocab-sized table joined to the scoring stream by token hash plus
  * a broadcast 1-row stats frame (class totals, priors, smoothing
  * floors for unseen tokens). No iteration, no driver-side model, no
  * all-pairs anything.
  */
object NaiveBayes {

  /** Train on (id, y ∈ {−1,+1}) labels: returns the token model
    * (token, c_pos, c_neg, lp_pos_micro, lp_neg_micro) where
    * `lp_c = round(ln((count_in_class + 1) / (class_total + V)) · 1e6)`.
    * Rows exist for every token seen in EITHER class (absent class
    * count = 0 still yields the smoothed log-prob).
    */
  def trainMultinomial(docs: DataFrame, labels: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    // join labels at DOCUMENT granularity, then explode: labels are
    // data-sized, so past the broadcast threshold this join becomes a
    // shuffle join — joining before the explode shuffles |docs| rows
    // instead of sorting the exploded token stream (the 1000× soak read
    // 65× on 10× data with the explode-first shape: the 600 M-row token
    // stream hit a SortMergeJoin when the 5 M-row labels stopped
    // broadcasting)
    val toks = docs
      .select(col(idCol).as("id"), col(textCol))
      .join(labels, "id")
      .select(col("id"), col("y"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    // Deliberately LAZY (round-13 negative result): the plan audit read
    // 12 documents scans in the scoring plan (perClass feeds both the
    // stats aggregate and the final select; score references stats
    // twice), but those identical subchains share their shuffle output
    // at runtime via ReusedExchange — pinning perClass + the stats frame
    // measured 19.0 → 21.3 s at 100× (the eager jobs serialize what the
    // scheduler otherwise overlaps). "Lazy never loses" (BASELINE r11).
    val perClass = toks.groupBy("tok").agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("c_neg"))
    val stats = perClass.agg(
      sum(col("c_pos")).as("tot_pos"), sum(col("c_neg")).as("tot_neg"),
      count(lit(1)).as("v"))
    perClass.crossJoin(broadcast(stats))
      .select(col("tok").as("token"), col("c_pos"), col("c_neg"),
        round(log((col("c_pos") + 1).cast("double")
          / (col("tot_pos") + col("v")).cast("double")) * 1e6)
          .cast("long").as("lp_pos_micro"),
        round(log((col("c_neg") + 1).cast("double")
          / (col("tot_neg") + col("v")).cast("double")) * 1e6)
          .cast("long").as("lp_neg_micro"))
  }

  /** Class priors and unseen-token floors as a 1-row broadcastable
    * frame: (n_pos, n_neg, prior_pos_micro, prior_neg_micro,
    * floor_pos_micro, floor_neg_micro) — floors are the smoothed
    * log-prob of a token with zero in-class count.
    */
  def classStats(docs: DataFrame, labels: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    // explode AFTER the labels join — see [[trainMultinomial]]
    val toks = docs
      .select(col(idCol).as("id"), col(textCol))
      .join(labels, "id")
      .select(col("id"), col("y"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tot = toks.agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("tot_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("tot_neg"),
      count_distinct(col("tok")).as("v"))
    val nd = labels.agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("n_neg"))
    nd.crossJoin(tot).select(
      col("n_pos"), col("n_neg"),
      round(log(col("n_pos").cast("double")
        / (col("n_pos") + col("n_neg")).cast("double")) * 1e6)
        .cast("long").as("prior_pos_micro"),
      round(log(col("n_neg").cast("double")
        / (col("n_pos") + col("n_neg")).cast("double")) * 1e6)
        .cast("long").as("prior_neg_micro"),
      round(log(lit(1.0) / (col("tot_pos") + col("v")).cast("double")) * 1e6)
        .cast("long").as("floor_pos_micro"),
      round(log(lit(1.0) / (col("tot_neg") + col("v")).cast("double")) * 1e6)
        .cast("long").as("floor_neg_micro"))
  }

  /** Score documents under a trained model: (id, s_pos_micro,
    * s_neg_micro, pred) — per-class score = prior + Σ token log-probs
    * (unseen tokens take the smoothing floor), prediction +1 iff the
    * positive score strictly wins (ties reject, the conservative gate
    * default).
    */
  def score(docs: DataFrame, model: DataFrame, stats: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val perDoc = toks
      // no broadcast hint on the model: it is vocab-sized, not
      // bounded — AQE broadcasts small vocabularies on its own and a
      // web-scale vocabulary must stay a shuffled hash join
      .join(model.withColumnRenamed("token", "tok"), Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .groupBy("id")
      .agg(
        sum(coalesce(col("lp_pos_micro"), col("floor_pos_micro"))).as("sum_pos"),
        sum(coalesce(col("lp_neg_micro"), col("floor_neg_micro"))).as("sum_neg"))
    perDoc.crossJoin(broadcast(stats))
      .select(col("id"),
        (col("prior_pos_micro") + col("sum_pos")).as("s_pos_micro"),
        (col("prior_neg_micro") + col("sum_neg")).as("s_neg_micro"))
      .withColumn("pred",
        when(col("s_pos_micro") > col("s_neg_micro"), lit(1)).otherwise(lit(-1)))
  }
}
