package graft

import graft.ops.Normalize

class MadSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    // median 3, deviations [2,1,0,1,2] → mad 1
    ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0),
    // one wild outlier: median 2.5, deviations [1.5, 0.5, 0.5, 997.5] → mad 1.0
    ("b", 1.0), ("b", 2.0), ("b", 3.0), ("b", 1000.0)
  ).toDF("g", "v")

  private lazy val out =
    Normalize.madPerGroup(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap

  test("mad on a clean group") {
    assert(out("a") === ((5L, 3.0, 1.0)))
  }

  test("mad shrugs off the outlier that would dominate a stddev") {
    val (n, med, mad) = out("b")
    assert(n === 4L && med === 2.5 && mad === 1.0)
    // the sample stddev of group b is ~498 — mad stays at 1
  }

  test("deterministic under repartitioning") {
    val again = Normalize.madPerGroup(df.repartition(5), Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again === out.view.mapValues(_._3).toMap)
  }
}
