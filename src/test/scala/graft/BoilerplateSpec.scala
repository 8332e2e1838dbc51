package graft

import graft.text.Boilerplate

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  // siteA: "menu" in 3/3 docs, "home" in 2/3, content tokens in 1/3 each.
  // siteB: one doc — its every token is in 1/1 = 100% of the source.
  private lazy val docs = Seq(
    (1L, "siteA", "menu home apples are red menu"),
    (2L, "siteA", "menu home pears are green"),
    (3L, "siteA", "menu cherries are dark"),
    (4L, "siteB", "menu only one doc here")
  ).toDF("id", "src", "text")

  private def run(num: Int, den: Int): Map[Long, (String, Long, Long)] =
    Boilerplate.stripBoilerplate(docs, "id", "text", "src", num, den)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("tokens at or above the per-source threshold are stripped, order kept") {
    val out = run(9, 10) // 90%: siteA strips "menu"+"are" (3/3); siteB strips all
    assert(out(1L) === (("home apples red", 3L, 3L))) // both "menu" occurrences dropped
    assert(out(2L) === (("home pears green", 3L, 2L)))
    assert(out(3L) === (("cherries dark", 2L, 2L)))
    assert(out(4L) === (("", 0L, 5L))) // single-doc source: everything is 100%
  }

  test("threshold is per source, not global") {
    // 2/3 threshold: siteA also strips "home" (2/3); "apples" (1/3) survives
    val out = run(2, 3)
    assert(out(1L) === (("apples red", 2L, 4L)))
    assert(out(3L) === (("cherries dark", 2L, 2L)))
  }

  test("threshold above every df is the identity") {
    // siteA max df is 3/3 = 1 → fracNum=fracDen keeps "menu" stripped only
    // if df = n_docs exactly; check a source where nothing reaches 100%
    val out = run(1, 1)
    assert(out(2L)._1 === "home pears green") // "menu"+"are" at 3/3 still go
    assert(out(1L)._2 === 3L)
  }

  test("invalid threshold is rejected") {
    intercept[IllegalArgumentException] {
      Boilerplate.stripBoilerplate(docs, "id", "text", "src", 3, 2)
    }
  }
}
