package graft

import graft.text.LmScore

class LmScoreSpec extends SparkTestBase {

  test("knBigramLogProb matches the hand-computed Kneser-Ney values") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "b c")).toDF("doc_id", "text")
    // bigram types: ab(2), ba(1), bc(2); hist a:(c1=2,n1=1) b:(c1=3,n1=2);
    // cont: a<-1, b<-1, c<-1; total types nb=3
    def p(c12: Long, c1: Long, n1: Long, nw2: Long): Double =
      math.max(c12.toDouble - 0.75, 0.0) / c1.toDouble +
        0.75 * n1.toDouble / c1.toDouble * (nw2.toDouble / 3.0)
    def q(x: Double): Long = math.round(math.log(x) * 1e6)
    val pAb = p(2, 2, 1, 1) // 0.625 + 0.125  = 0.75
    val pBa = p(1, 3, 2, 1) // 1/12 + 1/6     = 0.25
    val pBc = p(2, 3, 2, 1) // 5/12 + 1/6
    val out = graft.text.LmScore.knBigramLogProb(docs, "doc_id", "text")
      .orderBy("id").select("id", "n_pairs", "lp_micro")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, q(pAb) + q(pBa) + q(pAb) + q(pBc)),
      (2L, 1L, q(pBc))))
  }

  test("knBigramLogProb: single-token and empty docs score NULL mean, 0 pairs") {
    import spark.implicits._
    val docs = Seq((1L, "only"), (2L, "a b")).toDF("doc_id", "text")
    val r = graft.text.LmScore.knBigramLogProb(docs, "doc_id", "text")
      .orderBy("id").select("id", "n_pairs").as[(Long, Long)].collect().toSeq
    assert(r === Seq((1L, 0L), (2L, 1L)))
  }

  test("knBigramLogProb is partition-invariant") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"w${i % 5} w${i % 3} w${i % 7} w${i % 5}"))
      .toDF("doc_id", "text")
    def run(n: Int) =
      graft.text.LmScore.knBigramLogProb(docs.repartition(n), "doc_id", "text")
        .orderBy("id").collect().toSeq
    assert(run(1) === run(6))
  }
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
