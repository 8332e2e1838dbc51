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
}
