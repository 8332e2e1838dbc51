package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Trainable linear text classifier — the fastText-family quality
  * filter of LLM curation pipelines (CCNet's "looks like Wikipedia"
  * gate, Llama-style "educational value" scoring): hashed bag-of-token
  * features, a linear decision boundary, trained INSIDE the engine with
  * full-batch perceptron updates.
  *
  * Why a perceptron and not logistic SGD: determinism. SGD's update
  * order is the row order — unreplayable on a distributed shuffle — and
  * a sigmoid turns every margin into libm floats. The full-batch
  * perceptron update (`w += Σ_{misclassified} y·x`) is a pure integer
  * aggregation: token counts are integers, labels are ±1, so weights,
  * margins and the misclassified set are exact integers in ANY
  * partition/merge order, and an external engine replays training
  * bit-for-bit. (Margin-based linear separators of this family are the
  * published shape: Rosenblatt's perceptron; full-batch = the classic
  * "batch perceptron" variant.)
  *
  * Scale shape (100 TB): the feature table (one explode + hash +
  * (id, bucket) count) is built once and localCheckpointed — training
  * re-reads it 2·T times and must not re-tokenize per pass. The model
  * is `dims`(+bias) rows: it rides a broadcast join; each iteration is
  * two narrow shuffles (margins keyed on id, gradient keyed on bucket)
  * and the model update itself is model-sized, collected to the driver
  * exactly like the k-means centroid loop ([[graft.similarity.Kmeans]]).
  * Nothing corpus-sized ever sits on the driver.
  */
object LinearModel {

  /** Bucket id reserved for the intercept feature. */
  val biasBucket: Long = -1L

  /** Hashed token-count features: (id, bucket, x) with
    * `bucket = md5Long(token) % dims` (md5-derived — the repo's
    * replayable-hash convention) and `x` the token's in-doc count;
    * plus, when `withBias`, one (id, -1, 1) intercept row per doc.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     dims: Int, withBias: Boolean = true): DataFrame = {
    require(dims >= 2, s"dims=$dims must be >= 2")
    val counts = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("bucket", NearDup.md5Long(col("tok")) % dims)
      .groupBy("id", "bucket")
      .agg(count(lit(1)).as("x"))
    if (!withBias) counts
    else counts.unionByName(
      docs.select(col(idCol).as("id"), lit(biasBucket).as("bucket"),
        lit(1L).as("x")))
  }

  /** One full-batch perceptron pass over `feats` given the current
    * model: (bucket, dw) — the summed update `Σ y·x` over documents the
    * model misclassifies (margin `y·(w·x) <= 0`; the zero-margin start
    * counts every doc, the textbook convention).
    */
  def perceptronDelta(feats: DataFrame, labels: DataFrame,
                      weights: DataFrame): DataFrame = {
    val margins = feats
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("s"))
    val mis = labels.join(margins, "id")
      .filter(col("y") * col("s") <= 0)
      .select("id", "y")
    mis.join(feats, "id")
      .groupBy("bucket")
      .agg(sum(col("y") * col("x")).as("dw"))
  }

  /** Train `iters` full-batch rounds from the zero model. `labels` is
    * (id, y) with y ∈ {−1, +1}. Returns the weight table (bucket, w) —
    * only buckets that ever received an update appear (absent = 0).
    * The per-round model collect is `dims`+1 rows.
    */
  def trainPerceptron(spark: SparkSession, feats: DataFrame, labels: DataFrame,
                      iters: Int): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    import spark.implicits._
    val f = feats.localCheckpoint()
    val l = labels.localCheckpoint()
    var w = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val wDf = w.toSeq.toDF("bucket", "w")
      val delta = perceptronDelta(f, l, wDf).collect()
      delta.foreach { r =>
        val b = r.getLong(0); val dw = r.getLong(1)
        w = w.updated(b, w.getOrElse(b, 0L) + dw)
      }
    }
    w.toSeq.toDF("bucket", "w")
  }

  /** Pocket variant (Gallant's published fix for non-separable data):
    * run [[trainPerceptron]]'s rounds but KEEP the weights of the round
    * with the best training accuracy — strictly-greater wins, so ties
    * keep the earliest round and the result is deterministic. Costs one
    * extra distributed accuracy count per round; on oscillating
    * full-batch dynamics (synchronized count-magnitude updates on
    * near-template text) this returns the best visited model instead of
    * whatever the final flip landed on.
    */
  def trainPocket(spark: SparkSession, feats: DataFrame, labels: DataFrame,
                  iters: Int): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    import spark.implicits._
    val f = feats.localCheckpoint()
    val l = labels.localCheckpoint()
    var w = Map.empty[Long, Long]
    var bestAcc = -1L
    var bestW = w
    for (_ <- 1 to iters) {
      val wDf = w.toSeq.toDF("bucket", "w")
      val delta = perceptronDelta(f, l, wDf).collect()
      delta.foreach { r =>
        val b = r.getLong(0); val dw = r.getLong(1)
        w = w.updated(b, w.getOrElse(b, 0L) + dw)
      }
      val acc = score(f, w.toSeq.toDF("bucket", "w"))
        .join(l, "id").filter(col("pred") === col("y")).count()
      if (acc > bestAcc) { bestAcc = acc; bestW = w }
    }
    bestW.toSeq.toDF("bucket", "w")
  }

  /** Apply a weight table: (id, margin, pred) with `pred = sign(w·x)`
    * (zero margin predicts −1: an untrained or cancelled-out model
    * REJECTS, the conservative default for a quality gate).
    */
  def score(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("margin"))
      .withColumn("pred", when(col("margin") > 0, lit(1)).otherwise(lit(-1)))

  // ------------------------------------------------------------------
  // Logistic regression, hard-sigmoid link — the PROBABILITY-emitting
  // member of the family. The perceptron above yields a margin and a
  // sign; curation pipelines usually want a calibrated-ish score to
  // threshold at different strictness tiers (fastText quality filters
  // ship probabilities for exactly this reason). True logistic SGD is
  // out (row-order-dependent, libm exp in every update — unreplayable);
  // the published escape is the hard sigmoid (piecewise-linear
  // σ̂(z) = clamp(z/4 + 1/2, 0, 1) — Courbariaux et al.'s
  // BinaryConnect approximation), whose full-batch gradient
  // Σ (σ̂(z_i) − y01_i)·x_i is EXACT integer arithmetic end to end:
  // margins are micro-unit integers, σ̂ is one add + one clamp in
  // quarter-micro units (q-units: 4·10⁶ = probability 1 — the /4 slope
  // folds into the unit so no division ever happens row-side), and the
  // update's single truncating division happens ON THE DRIVER over the
  // dims+1 collected gradient rows (sign·(|g·lrNum| div d) — the
  // [[graft.similarity.Pca]] replay convention for DuckDB `//`).
  //
  // Scale shape: identical to [[trainPerceptron]] — per round, one
  // broadcast model join + two narrow shuffles (margins on id,
  // gradient on bucket); the collect is dims+1 rows. Gradient
  // magnitude budget: |e_q| ≤ 4·10⁶, so a bucket's gradient is bounded
  // by 4·10⁶ · (tokens hashing to it) — Int64-safe while
  // tokens/bucket < 2.3·10¹²; at larger corpora raise `dims` (the
  // hashing trick's standard lever), which divides the per-bucket
  // token mass.
  // ------------------------------------------------------------------

  /** Probability 1.0 in q-units (quarter-micro). */
  val OneQ: Long = 4000000L

  /** One full-batch hard-sigmoid gradient: (bucket, g) with
    * `g = Σ_docs (p_q − OneQ·y01)·x` where `p_q = clamp(2e6 + z, 0,
    * 4e6)` and `z = Σ x·w` (w in micro-units). Labels y ∈ {−1,+1}.
    */
  def logisticGradient(feats: DataFrame, labels: DataFrame,
                       weights: DataFrame): DataFrame = {
    val probs = feats
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("z"))
      .withColumn("p_q",
        least(greatest(lit(OneQ / 2) + col("z"), lit(0L)), lit(OneQ)))
    labels.join(probs, "id")
      .withColumn("e_q",
        col("p_q") - when(col("y") === 1, lit(OneQ)).otherwise(lit(0L)))
      .join(feats, "id")
      .groupBy("bucket")
      .agg(sum(col("e_q") * col("x")).as("g"))
  }

  /** Train `iters` full-batch gradient-descent rounds from the zero
    * model with learning rate `lrNum/lrDen`. Per round each weight
    * moves by `−truncDiv(g·lrNum, 4·N·lrDen)` micro-units (the /4
    * unwinds the q-unit scale; /N makes the gradient a mean) — Scala's
    * native truncating Long division, replayed in SQL as
    * sign·(abs // d). Returns (bucket, w) in micro-units.
    */
  def trainLogistic(spark: SparkSession, feats: DataFrame, labels: DataFrame,
                    iters: Int, lrNum: Long = 1L, lrDen: Long = 2L): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    require(lrNum >= 1 && lrDen >= 1, s"lr $lrNum/$lrDen must be positive")
    import spark.implicits._
    val f = feats.localCheckpoint()
    val l = labels.localCheckpoint()
    val n = l.count()
    require(n > 0, "empty label set")
    val d = 4L * n * lrDen
    var w = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val wDf = w.toSeq.toDF("bucket", "w")
      val grad = logisticGradient(f, l, wDf).collect()
      grad.foreach { r =>
        val b = r.getLong(0)
        val dw = (r.getLong(1) * lrNum) / d // truncating, like SQL abs-//
        w = w.updated(b, w.getOrElse(b, 0L) - dw)
      }
    }
    w.toSeq.toDF("bucket", "w")
  }

  /** Score under a trained logistic model: (id, z_micro, p_q, pred) —
    * `p_q` is the hard-sigmoid probability in q-units (4e6 = 1.0),
    * `pred = +1` iff p > 1/2 strictly (ties reject, the family's
    * conservative-gate convention).
    */
  def scoreLogistic(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("id")
      .agg(sum(col("x") * coalesce(col("w"), lit(0L))).as("z_micro"))
      .withColumn("p_q",
        least(greatest(lit(OneQ / 2) + col("z_micro"), lit(0L)), lit(OneQ)))
      .withColumn("pred",
        when(col("p_q") > OneQ / 2, lit(1)).otherwise(lit(-1)))

  /** Operating-point sweep for a probability-scored quality gate:
    * per threshold θ (accept iff `p_q > θ` — the [[scoreLogistic]]
    * strict convention) the confusion counts and micro-quantized
    * precision / recall / F1. This is the table a curation pipeline
    * reads to pick its strictness tier — and the reason the logistic
    * member emits probabilities at all.
    *
    * ONE pass over the scored corpus, not |thresholds| passes: each doc
    * is bucketed by the COUNT of thresholds strictly below its `p_q`
    * (a codegen'd when-chain — `pred@θ_k ⇔ bucket ≥ k+1` for sorted
    * distinct thresholds), the corpus aggregates to ≤ 2·(K+1) rows, and
    * the per-threshold cumulation runs on that tiny frame. F1 is
    * computed as 2·tp / (2·tp + fp + fn) — one division, no compounded
    * rounding. Zero denominators yield 0 (the conservative "gate
    * rejects everything / accepts nothing useful" reading), not NULL.
    *
    * `scored` needs (id, p_q); `labels` (id, y ∈ {−1,+1}).
    */
  def thresholdSweep(scored: DataFrame, labels: DataFrame,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "empty threshold list")
    val ts = thresholds.sorted
    require(ts.distinct == ts, s"thresholds must be distinct: $thresholds")
    val bucket = ts.foldLeft(lit(0)) { (acc, t) =>
      acc + when(col("p_q") > t, 1).otherwise(0)
    }
    val byBucket = scored.join(labels, "id")
      .groupBy(bucket.as("b"))
      .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y") === -1, 1L).otherwise(0L)).as("n_neg"))
    val spark = scored.sparkSession
    import spark.implicits._
    val thr = ts.zipWithIndex.map { case (t, k) => (t, k) }.toDF("thr_q", "k")
    val joined = broadcast(thr).join(byBucket, col("b") >= col("k") + 1, "left")
    val counts = joined.groupBy("thr_q")
      .agg(sum(coalesce(col("n_pos"), lit(0L))).as("tp"),
        sum(coalesce(col("n_neg"), lit(0L))).as("fp"))
    val totals = labels.agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("all_pos"),
      sum(when(col("y") === -1, 1L).otherwise(0L)).as("all_neg"))
    def ratioMicro(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den === 0, lit(0L))
        .otherwise(round(num.cast("double") * lit(1e6) / den.cast("double"))
          .cast("long"))
    counts.crossJoin(broadcast(totals))
      .select(col("thr_q"), col("tp"), col("fp"),
        (col("all_pos") - col("tp")).as("fn"),
        (col("all_neg") - col("fp")).as("tn"))
      .withColumn("precision_micro", ratioMicro(col("tp"), col("tp") + col("fp")))
      .withColumn("recall_micro", ratioMicro(col("tp"), col("tp") + col("fn")))
      .withColumn("f1_micro",
        ratioMicro(lit(2L) * col("tp"), lit(2L) * col("tp") + col("fp") + col("fn")))
  }
}
