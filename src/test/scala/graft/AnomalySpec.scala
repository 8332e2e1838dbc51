package graft

import java.sql.Timestamp

import graft.ops.Anomaly

class AnomalySpec extends SparkTestBase {
  import spark.implicits._

  private def t(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  private def flags(vals: Seq[Double], n: Int = 7, k: Int = 3,
                    minPrior: Int = 3): Seq[Boolean] = {
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, t(i), v) }
      .toDF("user_id", "event_id", "ts", "value")
    Anomaly.rollingZFlags(df, "user_id", "ts", "event_id", "value",
        n = n, k = k, minPrior = minPrior)
      .orderBy("event_id").collect().map(_.getBoolean(5)).toSeq
  }

  test("cold start below minPrior never flags") {
    assert(flags(Seq(1.0, 100.0, 1.0)) === Seq(false, false, false))
  }

  test("flat baseline + spike flags exactly the spike") {
    val out = flags(Seq(10.0, 10.0, 10.0, 10.0, 10.0, 100.0))
    assert(out === Seq(false, false, false, false, false, true))
  }

  test("flat baseline + identical value stays quiet (0 > 0 is false)") {
    val out = flags(Seq(10.0, 10.0, 10.0, 10.0, 10.0))
    assert(out.forall(_ == false))
  }

  test("z-threshold arithmetic: 1.1σ quiet, 4.6σ flagged") {
    // baseline alternates 10/20: mean 15, sample σ ≈ 5.48 over 6 priors
    val base = Seq(10.0, 20.0, 10.0, 20.0, 10.0, 20.0)
    assert(flags(base :+ 21.0, k = 3).last === false) // z ≈ 1.1
    assert(flags(base :+ 40.0, k = 3).last === true)  // z ≈ 4.6
  }

  test("keys are independent baselines") {
    val df = (Seq((1L, 1L, t(0), 10.0), (1L, 2L, t(1), 10.0),
      (1L, 3L, t(2), 10.0), (1L, 4L, t(3), 10.0),
      (2L, 5L, t(0), 500.0), (2L, 6L, t(1), 500.0),
      (2L, 7L, t(2), 500.0), (2L, 8L, t(3), 500.0),
      // 500 is normal for user 2, wildly anomalous for user 1
      (1L, 9L, t(4), 500.0), (2L, 10L, t(4), 500.0)))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Anomaly.rollingZFlags(df, "user_id", "ts", "event_id", "value",
        n = 7, k = 3, minPrior = 3)
      .collect().map(r => r.getLong(1) -> r.getBoolean(5)).toMap
    assert(out(9L) === true)
    assert(out(10L) === false)
  }
}
