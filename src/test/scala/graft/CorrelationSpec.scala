package graft

import graft.ops.Normalize

class CorrelationSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    ("lin", 1.0, 10.0), ("lin", 2.0, 20.0), ("lin", 3.0, 30.0),
    ("anti", 1.0, 3.0), ("anti", 2.0, 2.0), ("anti", 3.0, 1.0),
    ("flat", 1.0, 7.0), ("flat", 2.0, 7.0), ("flat", 3.0, 7.0),
    ("one", 5.0, 5.0),
    ("mix", 1.0, 2.0), ("mix", 2.0, 1.0), ("mix", 3.0, 4.0), ("mix", 4.0, 3.0)
  ).toDF("g", "x", "y")

  private lazy val out =
    Normalize.groupCorrelation(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap

  test("perfect linear and anti-linear groups") {
    assert(out("lin") === ((3L, Some(1.0))))
    assert(out("anti") === ((3L, Some(-1.0))))
  }

  test("zero variance and singleton groups are NULL, not NaN") {
    assert(out("flat") === ((3L, None)))
    assert(out("one") === ((1L, None)))
  }

  test("hand-computed mid-strength correlation") {
    // x=[1,2,3,4], y=[2,1,4,3]: n=4, sx=10, sy=10, sxy=28, sxx=30, syy=30
    // r = (112-100)/sqrt(20*20) = 0.6
    assert(out("mix") === ((4L, Some(0.6))))
  }

  test("invariant under repartitioning (exact partials)") {
    val shuffled = Normalize.groupCorrelation(df.repartition(7), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(shuffled === out.view.mapValues(_._2.map(identity[Any])).toMap)
  }
}
