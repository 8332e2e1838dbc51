package graft

import graft.text.LmScore

class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  // corpus: "a b" transition dominates; doc 4 uses unseen-direction
  // transitions so its score must come out lower
  private lazy val docs = Seq(
    (1L, "a b a b a b"),
    (2L, "a b a b"),
    (3L, "a b c"),
    (4L, "c a c"),  // "c a"/"a c" occur once each — rare transitions
    (5L, "x")       // single token: no bigrams
  ).toDF("id", "text")

  private lazy val out =
    LmScore.bigramLogProb(docs, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap

  test("per-doc pair counts") {
    assert(out(1L)._1 === 5L)
    assert(out(2L)._1 === 3L)
    assert(out(3L)._1 === 2L)
    assert(out(4L)._1 === 2L)
    assert(out(5L)._1 === 0L)
  }

  test("single-token docs score NULL, zero micro sum") {
    assert(out(5L) === ((0L, 0L, None)))
  }

  test("common-transition docs outscore rare-transition docs") {
    val avg = out.view.mapValues(_._3).toMap
    assert(avg(1L).get > avg(4L).get)
    assert(avg(2L).get > avg(4L).get)
  }

  test("micro sum replays from first principles") {
    // corpus counts: bigrams "a b"×6, "b a"×3, "b c"×1, "c a"×1, "a c"×1;
    // unigrams a×7, b×6, c×3, x×1; V=4
    def q(c12: Long, c1: Long): Long =
      math.round(math.log((c12 + 1).toDouble / (c1 + 4).toDouble) * 1e6)
    val doc3 = q(6, 7) + q(1, 6)   // "a b", "b c"
    assert(out(3L)._2 === doc3)
    val doc4 = q(1, 3) + q(1, 7)   // "c a", "a c"
    assert(out(4L)._2 === doc4)
  }
}
