package graft

import graft.text.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def top(docs: Seq[String], k: Int): Seq[(String, Long)] =
    Bpe.mergeCandidates(docs.map(Tuple1(_)).toDF("text"), "text", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("counts adjacent pairs per word instance, weighted by frequency") {
    // "aaab": pairs aa, aa, ab; appears twice -> aa:4, ab:2; "xy": xy:1
    val out = top(Seq("aaab aaab xy"), k = 10).toMap
    assert(out === Map("aa" -> 4L, "ab" -> 2L, "xy" -> 1L))
  }

  test("lowercases before pairing and ignores 1-char words") {
    val out = top(Seq("AB ab a B"), k = 10).toMap
    assert(out === Map("ab" -> 2L))
  }

  test("top-k ranking: count desc, pair asc tie-break") {
    val out = top(Seq("zz zz aa bb"), k = 2)
    assert(out === Seq(("zz", 2L), ("aa", 1L)))
  }

  test("pairs never cross word boundaries") {
    // "ab cd": no "bc" pair
    val out = top(Seq("ab cd"), k = 10).toMap
    assert(!out.contains("b c") && !out.contains("bc"))
    assert(out === Map("ab" -> 1L, "cd" -> 1L))
  }
}
