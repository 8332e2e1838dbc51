package graft

import graft.similarity.Fusion

class FusionSpec extends SparkTestBase {
  import spark.implicits._

  private def rnd6(x: Double) = math.rint(x * 1e6) / 1e6

  test("rrf: both-sides items outrank single-side; reciprocal sums exact") {
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("qid", "id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("qid", "id", "rank")
    val got = Fusion.rrf(a, b, k = 10).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"), r.getAs[Double]("rrf"),
        Option(r.getAs[Integer]("rank_a")), Option(r.getAs[Integer]("rank_b"))))
      .sortBy(_._1)
    // 20 appears in both lists (1/62 + 1/61) and must fuse above either
    // single-list item despite never ranking first in list a
    assert(got.map(x => (x._1, x._2)).toSeq === Seq((1, 20L), (2, 10L), (3, 30L)))
    assert(got(0)._3 === rnd6(1.0 / 62 + 1.0 / 61))
    assert(got(1)._3 === rnd6(1.0 / 61))
    // provenance survives: the missing side is NULL, not zero
    assert(got(1)._4 === Some(1) && got(1)._5 === None)
    assert(got(2)._4 === None && got(2)._5 === Some(2))
  }

  test("rrf: equal fused scores tie-break by id; k cuts the fused list") {
    val a = Seq((2L, 5L, 1)).toDF("qid", "id", "rank")
    val b = Seq((2L, 3L, 1)).toDF("qid", "id", "rank")
    val got = Fusion.rrf(a, b, k = 1).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("id") === 3L) // same 1/61 → smaller id wins
  }

  test("rrf: queries present in only one ranking still fuse") {
    val a = Seq((1L, 10L, 1)).toDF("qid", "id", "rank")
    val b = Seq((9L, 99L, 1)).toDF("qid", "id", "rank")
    val got = Fusion.rrf(a, b, k = 5).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("id")).toSet
    assert(got === Set(1L -> 10L, 9L -> 99L))
  }
}
