package graft

import graft.text.Repetition

class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b a b a b"),    // 2g: ab,ba,ab,ba,ab (5 tot / 2 dist / top 3)
                            // 3g: aba,bab,aba,bab (4/2/2); 4g: abab,baba,abab (3/2/2)
    (2L, "x y z w"),        // all widths fully distinct
    (3L, "solo"),           // shorter than every width → (0,0,0) rows
    (4L, "p q p q r r p q") // 2g: pq×3,qp×2,qr,rr,rp → 7/5/3
  ).toDF("doc_id", "text")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("id"), r.getAs[Int]("n"))

  test("ngramStats: per-width totals, distincts, top counts; short docs keep zero rows") {
    val m = Repetition.ngramStats(docs, "doc_id", "text", Seq(2, 3, 4))
      .collect().map(r => key(r) -> r).toMap
    assert(m.size === 12) // 4 docs × 3 widths, total grid
    assert(m((1L, 2)).getAs[Long]("total_grams") === 5L)
    assert(m((1L, 2)).getAs[Long]("distinct_grams") === 2L)
    assert(m((1L, 2)).getAs[Long]("top_count") === 3L)
    assert(m((1L, 3)).getAs[Long]("total_grams") === 4L)
    assert(m((1L, 3)).getAs[Long]("distinct_grams") === 2L)
    assert(m((1L, 4)).getAs[Long]("top_count") === 2L)
    assert(m((2L, 2)).getAs[Long]("total_grams") === 3L)
    assert(m((2L, 2)).getAs[Long]("distinct_grams") === 3L)
    assert(m((3L, 2)).getAs[Long]("total_grams") === 0L)
    assert(m((3L, 4)).getAs[Long]("top_count") === 0L)
    assert(m((4L, 2)).getAs[Long]("total_grams") === 7L)
    assert(m((4L, 2)).getAs[Long]("distinct_grams") === 5L)
    assert(m((4L, 2)).getAs[Long]("top_count") === 3L)
  }

  test("report: integer-exact flags — dup share, top dominance, zero-gram never flagged") {
    val m = Repetition.report(docs, "doc_id", "text",
      dupPermille = Map(2 -> 400, 3 -> 300, 4 -> 250),
      topPermille = Map(2 -> 200, 3 -> 180, 4 -> 160))
      .collect().map(r => key(r) -> r.getAs[Boolean]("rep_flag")).toMap
    assert(m((1L, 2)))           // dup (5-2)/5 = 600‰ > 400‰ and top 3/5 > 200‰
    assert(m((1L, 3)))           // dup 500‰ > 300‰
    assert(m((2L, 2)))           // all distinct, but top 1/3 = 333‰ > 200‰ —
                                 // dominance flags tiny docs by construction
    assert(m((3L, 2)) === false) // zero grams → never flagged
    assert(m((4L, 2)))           // dup (7-5)/7 = 285‰ < 400‰ but top 3/7 = 428‰ > 200‰
  }

  test("report: boundary is strict — exactly-at-threshold does not flag") {
    // "a b a c": 2g = ab, ba, ac → 3 total, 3 distinct, top 1.
    // top·1000 = 1000; th(n=2)·total with th=333 → 999 < 1000 flags;
    // th=334 → 1002 ≥ 1000 must NOT flag (strict >).
    val d = Seq((9L, "a b a c")).toDF("doc_id", "text")
    val strict = Repetition.report(d, "doc_id", "text",
      dupPermille = Map(2 -> 1000), topPermille = Map(2 -> 334))
      .collect().head.getAs[Boolean]("rep_flag")
    assert(!strict)
    val under = Repetition.report(d, "doc_id", "text",
      dupPermille = Map(2 -> 1000), topPermille = Map(2 -> 333))
      .collect().head.getAs[Boolean]("rep_flag")
    assert(under)
  }

  test("report: threshold maps must cover identical widths") {
    intercept[IllegalArgumentException] {
      Repetition.report(docs, "doc_id", "text",
        dupPermille = Map(2 -> 400), topPermille = Map(3 -> 200))
    }
  }
}
