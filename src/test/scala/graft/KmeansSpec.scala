package graft

import graft.similarity.Kmeans

class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  // 2-dim corpus with unambiguous nearest centroids (cosine):
  //   10,11 → cell 0 (x-axis); 12 → cell 1 (y-axis);
  //   13 = [1,1] ties both at cos √2/2 → larger cell id wins (Ivf rule) → 1
  private lazy val corpus = Seq(
    (10L, Array(2.0f, 0.0f)),
    (11L, Array(4.0f, 0.0f)),
    (12L, Array(0.0f, 3.0f)),
    (13L, Array(1.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  private val cents = Seq(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0))

  test("lloydStep: hand-computed fixed-point means per (cell, dim)") {
    val got = Kmeans.lloydStep(corpus, cents)
      .collect()
      .map(r => (r.getAs[Long]("cell"), r.getAs[Int]("pos")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean")))).toMap
    assert(got === Map(
      (0L, 0) -> ((2L, 3.0)), (0L, 1) -> ((2L, 0.0)),   // mean of [2,0],[4,0]
      (1L, 0) -> ((2L, 0.5)), (1L, 1) -> ((2L, 2.0))))  // mean of [0,3],[1,1]
  }

  test("lloydStep is partition-invariant (fixed-point sums, not float order)") {
    val base = Kmeans.lloydStep(corpus, cents).collect().toSet
    val shuffled = Kmeans.lloydStep(corpus.repartition(7), cents).collect().toSet
    assert(base === shuffled)
  }

  test("updatedCentroids: moved cells take member means, empty cells keep old") {
    // cell 2 points away from every (positive-coordinate) corpus vector —
    // it receives no members and must survive the step unchanged
    val withEmpty = cents :+ (2L -> Seq(-1.0, -1.0))
    val updated = Kmeans.updatedCentroids(corpus, withEmpty).toMap
    assert(updated(0L) === Seq(3.0, 0.0))
    assert(updated(1L) === Seq(0.5, 2.0))
    assert(updated(2L) === Seq(-1.0, -1.0))
  }

  test("train: k centroids out, iteration converges on the toy corpus") {
    val model = Kmeans.train(corpus, k = 2, iters = 3)
    assert(model.size === 2)
    // a converged model reproduces itself under one more step
    val again = Kmeans.updatedCentroids(corpus, model)
    assert(again.toMap === model.toMap)
  }
}
