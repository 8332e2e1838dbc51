package graft

import org.apache.spark.sql.functions._

import graft.text.LinearModel

class LinearModelSpec extends SparkTestBase {
  import spark.implicits._

  test("hashedFeatures counts tokens per bucket and adds one bias row per doc") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val f = LinearModel.hashedFeatures(docs, "doc_id", "text", dims = 8)
    val bias = f.filter($"bucket" === LinearModel.biasBucket)
      .select("id", "x").as[(Long, Long)].collect().toSet
    assert(bias === Set((1L, 1L), (2L, 1L)))
    // token counts: doc 1 has 3 tokens across at most 2 buckets
    val d1 = f.filter($"id" === 1L && $"bucket" =!= LinearModel.biasBucket)
      .agg(sum("x")).as[Long].head()
    assert(d1 === 3L)
    val buckets = f.select("bucket").as[Long].collect()
    assert(buckets.forall(b => b == -1L || (b >= 0 && b < 8)))
  }

  test("trainPerceptron reproduces the hand-computed update sequence") {
    val feats = Seq((1L, 0L, 2L), (1L, -1L, 1L), (2L, 1L, 3L), (2L, -1L, 1L))
      .toDF("id", "bucket", "x")
    val labels = Seq((1L, 1), (2L, -1)).toDF("id", "y")
    val w = LinearModel.trainPerceptron(spark, feats, labels, iters = 2)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    // round 1: zero model misclassifies both -> b0 += +1*2, b1 += -1*3,
    // bias += (+1) + (-1) = 0; round 2: both margins correct, no update.
    assert(w === Seq((-1L, 0L), (0L, 2L), (1L, -3L)))
    val scored = LinearModel.score(feats, LinearModel.trainPerceptron(spark, feats, labels, 2))
      .orderBy("id").select("id", "margin", "pred").as[(Long, Long, Int)].collect().toSeq
    assert(scored === Seq((1L, 4L, 1), (2L, -9L, -1)))
  }

  test("separable corpus is classified perfectly after a few rounds") {
    val docs = (0L until 40L).map { i =>
      val marker = if (i % 2 == 0) "excellent prose paragraph" else "spam junk listing"
      (i, s"$marker filler token$i common words here")
    }.toDF("doc_id", "text")
    val labels = (0L until 40L).map(i => (i, if (i % 2 == 0) 1 else -1)).toDF("id", "y")
    val feats = LinearModel.hashedFeatures(docs, "doc_id", "text", dims = 32)
    val w = LinearModel.trainPerceptron(spark, feats, labels, iters = 5)
    val acc = LinearModel.score(feats, w).join(labels, "id")
      .agg(avg(when($"pred" === $"y", 1.0).otherwise(0.0))).as[Double].head()
    assert(acc === 1.0)
  }

  test("training is partition-invariant (integer-exact aggregation)") {
    val docs = (0L until 30L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} shared words tok${i % 11}"))
      .toDF("doc_id", "text")
    val labels = (0L until 30L).map(i => (i, if (i % 3 == 0) 1 else -1)).toDF("id", "y")
    def run(parts: Int) = {
      val f = LinearModel.hashedFeatures(docs.repartition(parts), "doc_id", "text", 16)
      LinearModel.trainPerceptron(spark, f, labels.repartition(parts), iters = 3)
        .orderBy("bucket").as[(Long, Long)].collect().toSeq
    }
    assert(run(1) === run(7))
  }

  test("zero-margin docs count as misclassified and score rejects on zero") {
    val feats = Seq((1L, 0L, 1L)).toDF("id", "bucket", "x")
    val labels = Seq((1L, -1)).toDF("id", "y")
    // round 1 on zero model: margin 0 -> update fires, w(b0) = -1
    val w = LinearModel.trainPerceptron(spark, feats, labels, iters = 1)
      .as[(Long, Long)].collect().toSeq
    assert(w === Seq((0L, -1L)))
    val pred = LinearModel.score(feats, Seq.empty[(Long, Long)].toDF("bucket", "w"))
      .select("pred").as[Int].head()
    assert(pred === -1)
  }
}
