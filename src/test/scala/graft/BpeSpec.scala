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

  private def train(docs: Seq[String], rounds: Int): Seq[(Int, String, String, String, Long)] =
    Bpe.train(docs.map(Tuple1(_)).toDF("text"), "text", rounds)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq

  test("train: iterated merges with weighted counts and deterministic tie-break") {
    // "aaab" x3: round 1 merges (a,a) cnt 6 -> [aa, a, b].
    // round 2: (aa,a)=3 ties (a,b)=3 -> pa-asc tie-break picks (a,b) -> [aa, ab].
    // round 3: (aa,ab)=3 -> "aaab".
    val out = train(Seq("aaab aaab", "aaab"), rounds = 3)
    assert(out === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("train: merge application is leftmost-greedy non-overlapping (the BPE rule)") {
    // "bbbb": round-1 pair (b,b) has 3 occurrences (per-position), and
    // applying it must yield [bb, bb] (leftmost-greedy), never [b, bb, b]
    // — which round 2 exposes: (bb,bb)=1 only exists under the greedy
    // parse.
    val out = train(Seq("bbbb"), rounds = 2)
    assert(out === Seq(
      (1, "b", "b", "bb", 3L),
      (2, "bb", "bb", "bbbb", 1L)))
  }

  test("train: odd repeated-symbol runs parse greedily (bbbbb -> bb,bb,b)") {
    // The case a global double-`replace` gets wrong: merging (b,b) on
    // "bbbbb" must give [bb, bb, b] (leftmost-greedy), not [bb, b, bb].
    // Round 2 exposes it: greedy gives (bb,bb)=1 + (bb,b)=1 from
    // "bbbbb" and (bb,bb)=2 from "bbbbbb" -> argmax (bb,bb) count 3;
    // the double-replace parse would count (bb,bb)=2 only.
    val out = train(Seq("bbbbb bbbbbb"), rounds = 2)
    assert(out === Seq(
      (1, "b", "b", "bb", 9L),
      (2, "bb", "bb", "bbbb", 3L)))
  }

  test("encode: per-doc post-merge token counts with a fixed merge list") {
    val docs = Seq((1L, "aaab xy"), (2L, "aaab aaab"), (3L, "q")).toDF("doc_id", "text")
    // merges (a,a) then (a,b): "aaab" -> [aa, ab] = 2; "xy" -> 2; "q" -> 1
    val got = Bpe.encode(docs, "doc_id", "text", Seq(("a", "a"), ("a", "b")))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 4L), (2L, 4L), (3L, 1L)))
  }

  test("encode: empty merge list counts raw characters") {
    val docs = Seq((7L, "abc de")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, "doc_id", "text", Seq.empty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((7L, 5L)))
  }

  test("train: multi-char symbols never false-match inside neighbors") {
    // After round 1 merges (a,a)->aa in "aaab"x2 and "caab":
    // "caab" -> [c, aa, b]; pair (a,b) from "aaab" words must NOT match
    // the 'aa b' boundary in "caab" when applied (symbol-exact replace).
    val out = train(Seq("aaab aaab caab caab caab"), rounds = 2)
    // (a,a): 2 per "aaab" x2 + 1 per "caab" x3 = 7
    assert(out.head === ((1, "a", "a", "aa", 7L)))
    // round 2 counts: from 2x"aaab"=[aa,a,b]: (aa,a)=2,(a,b)=2;
    // from 3x"caab"=[c,aa,b]: (c,aa)=3,(aa,b)=3 -> argmax (aa,b) cnt 3
    assert(out(1) === ((2, "aa", "b", "aab", 3L)))
  }
}
