package graft

import org.apache.spark.sql.functions._

import graft.ops.Normalize

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0),   // mean 2, sample std 1
    ("b", 5.0), ("b", 5.0),               // zero variance
    ("c", 7.0)                            // single row
  ).toDF("key", "x")

  test("zscore: exact-sum sample stddev; degenerate groups yield NULL") {
    val got = Normalize.zscore(df, Seq("key"), "x", "z")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      ("a", 1.0, Some(-1.0)), ("a", 2.0, Some(0.0)), ("a", 3.0, Some(1.0)),
      ("b", 5.0, None), ("b", 5.0, None),  // σ = 0 → NULL, not Inf/NaN
      ("c", 7.0, None)))                   // n = 1 → NULL, no ANSI abort
  }

  test("minMaxScale: [0,1] within group; constant groups yield NULL") {
    val got = Normalize.minMaxScale(df, Seq("key"), "x", "mm")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set(
      ("a", 1.0, Some(0.0)), ("a", 2.0, Some(0.5)), ("a", 3.0, Some(1.0)),
      ("b", 5.0, None), ("b", 5.0, None),
      ("c", 7.0, None)))
  }

  test("zscore + minMax run in ONE window pass: a single hash exchange") {
    val p = Normalize.minMaxScale(
        Normalize.zscore(df, Seq("key"), "x", "z"), Seq("key"), "x", "mm")
      .queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"both normalizations must share one exchange:\n$p")
  }

  test("histogram: lower-bound bins, negatives floor away from zero") {
    val d = Seq(("k", -11L), ("k", -1L), ("k", 0L), ("k", 9L), ("k", 10L), ("k", 25L))
      .toDF("key", "v")
    val got = Normalize.histogram(d, Seq("key"), "v", binWidth = 10)
      .collect().map(r => r.getAs[Long]("bin_lo") -> r.getAs[Long]("n")).toMap
    assert(got === Map(-20L -> 1L, -10L -> 1L, 0L -> 2L, 10L -> 1L, 20L -> 1L))
  }
}
