package graft

import org.apache.spark.sql.functions._

import graft.ops.QuantileSketch

class QuantileSketchSpec extends SparkTestBase {
  import spark.implicits._

  // values 1..10 under [0,10)×10 bins: v lands in bin v (10 clamps to 9)
  private val tens = (1L to 10L).map(("k", _)).toDF("k", "v")

  test("bins: exact integer binning with edge clamping") {
    val b = QuantileSketch.bins(tens, Seq("k"), "v", lo = 0L, hi = 10L, nBins = 10)
      .orderBy("bin").as[(String, Long, Long)].collect().toSeq
    assert(b === ((1L to 8L).map(i => ("k", i, 1L)) :+ (("k", 9L, 2L))))
    // out-of-range values clamp into the edge bins
    val c = QuantileSketch.bins(Seq(("k", -5L), ("k", 99L)).toDF("k", "v"),
      Seq("k"), "v", 0L, 10L, 10)
      .orderBy("bin").as[(String, Long, Long)].collect().toSeq
    assert(c === Seq(("k", 0L, 1L), ("k", 9L, 1L)))
  }

  test("quantiles: hand-computed rank targets and interpolation") {
    val q = QuantileSketch.quantileSketch(tens, Seq("k"), "v",
      qsPerMille = Seq(500, 1000), lo = 0L, hi = 10L, nBins = 10)
      .orderBy("q_pm").as[(String, Int, Long, Long)].collect().toSeq
    // N=10: rk(500)=5 -> bin 5 (values 1..5 cumulate to 5), cb=4, n=1:
    //   est = (5 + 1/1)*1 = 6.0; rk(1000)=10 -> bin 9 (cum 10), cb=8, n=2:
    //   est = (9 + 2/2)*1 = 10.0
    assert(q === Seq(("k", 500, 10L, 6000000L), ("k", 1000, 10L, 10000000L)))
  }

  test("segment merge equals the one-shot sketch exactly (groupBy-sum algebra)") {
    val dir = java.nio.file.Files.createTempDirectory("qsketch").toString + "/seg"
    QuantileSketch.writeSegments(tens.filter($"v" <= 4), Seq("k"), "v", 0L, 10L, 10, dir)
    QuantileSketch.writeSegments(tens.filter($"v" > 4), Seq("k"), "v", 0L, 10L, 10, dir)
    val fromSeg = QuantileSketch.quantilesFromSegments(
      spark, dir, Seq("k"), Seq(250, 500, 750), 0L, 10L, 10)
      .orderBy("q_pm").collect().toSeq
    val oneShot = QuantileSketch.quantileSketch(
      tens, Seq("k"), "v", Seq(250, 500, 750), 0L, 10L, 10)
      .orderBy("q_pm").collect().toSeq
    assert(fromSeg === oneShot)
  }

  test("multi-key, partition-invariant") {
    val data = (0L until 200L).map(i => (s"s${i % 3}", i % 47)).toDF("k", "v")
    def run(parts: Int) = QuantileSketch.quantileSketch(
      data.repartition(parts), Seq("k"), "v", Seq(500, 950), 0L, 47L, 16)
      .orderBy("k", "q_pm").collect().toSeq
    assert(run(1) === run(8))
    assert(run(1).size === 6)
  }

  test("NULL metric values are excluded, not binned") {
    val withNulls = (Seq[java.lang.Long](1L, 2L, 3L, null, null))
      .map(v => ("k", v)).toDF("k", "v")
    val b = QuantileSketch.bins(withNulls, Seq("k"), "v", 0L, 10L, 10)
    assert(b.agg(sum($"n")).as[Long].head() === 3L)
    val q = QuantileSketch.quantileSketch(withNulls, Seq("k"), "v",
      Seq(1000), 0L, 10L, 10).select("n_total").as[Long].head()
    assert(q === 3L)
  }

  test("estimate is within one bin width of the exact quantile") {
    val vals = (1L to 1000L).map(("k", _)).toDF("k", "v")
    val est = QuantileSketch.quantileSketch(vals, Seq("k"), "v",
      Seq(500, 950), 0L, 1000L, 64).orderBy("q_pm")
      .select("est_micro").as[Long].collect().map(_ / 1e6)
    val width = 1000.0 / 64
    assert(math.abs(est(0) - 500.0) <= width)
    assert(math.abs(est(1) - 950.0) <= width)
  }
}
