package graft

import org.apache.spark.sql.functions._

import graft.text.{LinearModel, NaiveBayes}

class NaiveBayesSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
  private val labels = Seq((1L, 1), (2L, -1)).toDF("id", "y")

  test("trainMultinomial: hand-computed counts and smoothed log-probs") {
    val m = NaiveBayes.trainMultinomial(docs, labels, "doc_id", "text")
      .orderBy("token")
      .select("token", "c_pos", "c_neg", "lp_pos_micro", "lp_neg_micro")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // tot_pos=3, tot_neg=2, V=3: lp_pos(a)=ln(3/6), lp_neg(a)=ln(2/5), ...
    def q(x: Double): Long = math.round(math.log(x) * 1e6)
    assert(m === Seq(
      ("a", 2L, 1L, q(3.0 / 6), q(2.0 / 5)),
      ("b", 1L, 0L, q(2.0 / 6), q(1.0 / 5)),
      ("c", 0L, 1L, q(1.0 / 6), q(2.0 / 5))))
  }

  test("classStats: priors and unseen-token floors") {
    val st = NaiveBayes.classStats(docs, labels, "doc_id", "text")
      .select("n_pos", "n_neg", "prior_pos_micro", "floor_neg_micro")
      .as[(Long, Long, Long, Long)].head()
    def q(x: Double): Long = math.round(math.log(x) * 1e6)
    assert(st === ((1L, 1L, q(0.5), q(1.0 / 5))))
  }

  test("score separates the training docs and pred matches hand computation") {
    val m = NaiveBayes.trainMultinomial(docs, labels, "doc_id", "text")
    val st = NaiveBayes.classStats(docs, labels, "doc_id", "text")
    val sc = NaiveBayes.score(docs, m, st, "doc_id", "text")
      .orderBy("id").select("id", "pred").as[(Long, Int)].collect().toSeq
    assert(sc === Seq((1L, 1), (2L, -1)))
  }

  test("unseen tokens take the smoothing floor, not a null sum") {
    val m = NaiveBayes.trainMultinomial(docs, labels, "doc_id", "text")
    val st = NaiveBayes.classStats(docs, labels, "doc_id", "text")
    val novel = Seq((9L, "zzz a")).toDF("doc_id", "text")
    val row = NaiveBayes.score(novel, m, st, "doc_id", "text")
      .select("s_pos_micro", "s_neg_micro").as[(Long, Long)].head()
    def q(x: Double): Long = math.round(math.log(x) * 1e6)
    // zzz -> floor; a -> trained lp; prior on top
    assert(row._1 === q(0.5) + q(1.0 / 6) + q(3.0 / 6))
    assert(row._2 === q(0.5) + q(1.0 / 5) + q(2.0 / 5))
  }

  test("scoring is partition-invariant (integer micro-unit sums)") {
    val corpus = (0L until 60L)
      .map(i => (i, s"tok${i % 5} tok${i % 7} filler words tok${i % 3}"))
      .toDF("doc_id", "text")
    val lab = (0L until 60L).map(i => (i, if (i % 5 == 0) 1 else -1)).toDF("id", "y")
    def run(parts: Int) = {
      val d = corpus.repartition(parts)
      val m = NaiveBayes.trainMultinomial(d, lab, "doc_id", "text")
      val st = NaiveBayes.classStats(d, lab, "doc_id", "text")
      NaiveBayes.score(d, m, st, "doc_id", "text")
        .orderBy("id").collect().toSeq
    }
    assert(run(1) === run(8))
  }

  test("pocket perceptron keeps the best visited model on non-separable data") {
    // y over x=1,2,3 is -,+,- : not linearly separable; best linear = 2/3
    val feats = Seq((1L, 0L, 1L), (1L, -1L, 1L), (2L, 0L, 2L), (2L, -1L, 1L),
      (3L, 0L, 3L), (3L, -1L, 1L)).toDF("id", "bucket", "x")
    val labels = Seq((1L, -1), (2L, 1), (3L, -1)).toDF("id", "y")
    val pocket = LinearModel.trainPocket(spark, feats, labels, iters = 4)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    // round 1 lands w=(bias,b0)=(-1,-2) with acc 2/3; later rounds tie
    // or cycle back to zero -> pocket keeps round 1
    assert(pocket === Seq((-1L, -1L), (0L, -2L)))
    val acc = LinearModel.score(feats, LinearModel.trainPocket(spark, feats, labels, 4))
      .join(labels, "id").filter($"pred" === $"y").count()
    assert(acc === 2L)
    // the plain form at even iters has cycled back to the zero model
    val plain = LinearModel.trainPerceptron(spark, feats, labels, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(plain.values.forall(_ == 0L))
  }
}
