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

  test("trainLogistic reproduces the hand-computed gradient sequence (both ±.5 truncations)") {
    val feats = Seq((1L, 0L, 2L), (1L, -1L, 1L), (2L, 1L, 3L), (2L, -1L, 1L))
      .toDF("id", "bucket", "x")
    val labels = Seq((1L, 1), (2L, -1)).toDF("id", "y")
    // N=2, lr=1/2 -> d=16. Round 1 (zero model, p_q=2e6 everywhere):
    //   e1=-2e6, e2=+2e6; g_b0=-4e6, g_b1=+6e6, g_bias=0
    //   -> w = (b0: 250000, b1: -375000, bias: 0)
    // Round 2: z1=500000 -> e1=-1.5e6; z2=-1125000 -> p_q=875000, e2=875000
    //   g_b0=-3e6 -> dw=-187500; g_b1=2625000 -> dw=trunc(164062.5)=164062
    //   g_bias=-625000 -> dw=trunc(-39062.5)=-39062 (toward zero, BOTH signs)
    val w = LinearModel.trainLogistic(spark, feats, labels, iters = 2)
      .orderBy("bucket").as[(Long, Long)].collect().toSeq
    assert(w === Seq((-1L, 39062L), (0L, 437500L), (1L, -539062L)))
    val scored = LinearModel.scoreLogistic(feats,
        LinearModel.trainLogistic(spark, feats, labels, iters = 2))
      .orderBy("id").select("id", "z_micro", "p_q", "pred")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(scored === Seq((1L, 914062L, 2914062L, 1), (2L, -1578124L, 421876L, -1)))
  }

  test("logistic: hard sigmoid clamps to [0, 4e6] on saturated margins") {
    val feats = Seq((1L, 0L, 100L), (2L, 0L, 1L)).toDF("id", "bucket", "x")
    val w = Seq((0L, 1000000L)).toDF("bucket", "w") // 1.0 per count
    val out = LinearModel.scoreLogistic(feats, w)
      .orderBy("id").select("p_q").as[Long].collect().toSeq
    assert(out === Seq(4000000L, 3000000L)) // doc1 saturates, doc2 = 2e6+1e6
    val wneg = Seq((0L, -1000000L)).toDF("bucket", "w")
    val neg = LinearModel.scoreLogistic(feats, wneg)
      .orderBy("id").select("p_q", "pred").as[(Long, Int)].collect().toSeq
    assert(neg === Seq((0L, -1), (1000000L, -1)))
  }

  test("logistic: separable corpus reaches perfect accuracy with monotone probabilities") {
    val docs = (0L until 40L).map { i =>
      val marker = if (i % 2 == 0) "excellent prose paragraph" else "spam junk listing"
      (i, s"$marker filler token$i common words here")
    }.toDF("doc_id", "text")
    val labels = (0L until 40L).map(i => (i, if (i % 2 == 0) 1 else -1)).toDF("id", "y")
    val feats = LinearModel.hashedFeatures(docs, "doc_id", "text", dims = 32)
    val w = LinearModel.trainLogistic(spark, feats, labels, iters = 6)
    val scored = LinearModel.scoreLogistic(feats, w).join(labels, "id")
    val acc = scored.agg(avg(when($"pred" === $"y", 1.0).otherwise(0.0)))
      .as[Double].head()
    assert(acc === 1.0)
    // probabilities separate the classes: min positive p_q > max negative p_q
    val minPos = scored.filter($"y" === 1).agg(min("p_q")).as[Long].head()
    val maxNeg = scored.filter($"y" === -1).agg(max("p_q")).as[Long].head()
    assert(minPos > maxNeg)
  }

  test("logistic training is partition-invariant") {
    val docs = (0L until 30L)
      .map(i => (i, s"tok${i % 7} tok${i % 3} shared words tok${i % 11}"))
      .toDF("doc_id", "text")
    val labels = (0L until 30L).map(i => (i, if (i % 3 == 0) 1 else -1)).toDF("id", "y")
    def run(parts: Int) = {
      val f = LinearModel.hashedFeatures(docs.repartition(parts), "doc_id", "text", 16)
      LinearModel.trainLogistic(spark, f, labels.repartition(parts), iters = 3)
        .orderBy("bucket").as[(Long, Long)].collect().toSeq
    }
    assert(run(1) === run(7))
  }

  test("thresholdSweep: hand-computed confusion table, zero-denominator rule") {
    val scored = Seq((1L, 3500000L), (2L, 2500000L), (3L, 1500000L), (4L, 500000L))
      .toDF("id", "p_q")
    val labels = Seq((1L, 1), (2L, -1), (3L, 1), (4L, -1)).toDF("id", "y")
    val out = LinearModel.thresholdSweep(scored, labels,
        Seq(1000000L, 2000000L, 3000000L, 4000000L))
      .orderBy("thr_q")
      .select("thr_q", "tp", "fp", "fn", "tn",
        "precision_micro", "recall_micro", "f1_micro")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1000000L, 2L, 1L, 0L, 1L, 666667L, 1000000L, 800000L),
      (2000000L, 1L, 1L, 1L, 1L, 500000L, 500000L, 500000L),
      (3000000L, 1L, 0L, 1L, 2L, 1000000L, 500000L, 666667L),
      // p_q is clamped to <= 4e6, accept is STRICT > -> nothing accepted:
      // zero denominators read as 0, not NULL
      (4000000L, 0L, 0L, 2L, 2L, 0L, 0L, 0L)))
  }

  test("thresholdSweep bucketing matches the direct per-threshold definition") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 200L).map(i => (i, (rnd.nextInt(4000001)).toLong))
    val ys = (1L to 200L).map(i => (i, if (rnd.nextBoolean()) 1 else -1))
    val scored = rows.toDF("id", "p_q")
    val labels = ys.toDF("id", "y")
    val ts = Seq(0L, 800000L, 1600000L, 2400000L, 3200000L, 4000000L)
    val got = LinearModel.thresholdSweep(scored, labels, ts)
      .orderBy("thr_q").select("thr_q", "tp", "fp", "fn", "tn")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val yMap = ys.toMap
    val expected = ts.map { t =>
      val tp = rows.count { case (i, p) => p > t && yMap(i) == 1 }.toLong
      val fp = rows.count { case (i, p) => p > t && yMap(i) == -1 }.toLong
      val fn = rows.count { case (i, p) => p <= t && yMap(i) == 1 }.toLong
      val tn = rows.count { case (i, p) => p <= t && yMap(i) == -1 }.toLong
      (t, tp, fp, fn, tn)
    }
    assert(got === expected)
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
