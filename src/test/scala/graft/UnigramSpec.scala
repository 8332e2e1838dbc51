package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("vocab: occurrence-weighted substring counts, singles unconditional, threshold on longer") {
    // "ab" twice, "b" once -> substrings of ab: a, b, ab (cnt 2 each);
    // of b: b (1). With minCount=2: singles a (2), b (3) kept always;
    // "ab" kept at c=2.
    val v = Unigram.vocab(docsOf("ab ab b"), "doc_id", "text", minCount = 2L)
      .select("piece", "plen", "c").as[(String, Int, Long)].collect().toSet
    assert(v === Set(("a", 1, 2L), ("b", 1, 3L), ("ab", 2, 2L)))
    // minCount=3 drops the bigram but never the singles
    val v3 = Unigram.vocab(docsOf("ab ab b"), "doc_id", "text", minCount = 3L)
      .select("piece").as[String].collect().toSet
    assert(v3 === Set("a", "b"))
  }

  test("vocab scores are micro-quantized log-probs over the kept mass") {
    val v = Unigram.vocab(docsOf("ab ab b"), "doc_id", "text", minCount = 2L)
      .select("piece", "c", "score_micro").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val total = v.values.map(_._1).sum // 2 + 3 + 2 = 7
    assert(total === 7L)
    v.foreach { case (_, (c, s)) =>
      assert(s === math.round(math.log(c.toDouble / total) * 1e6))
    }
  }

  test("Viterbi picks the max-probability segmentation, not the greedy one") {
    // hand-built vocab: singles cheap, bigram "ab" very probable,
    // trigram "abc" mediocre. For word "abc": greedy-longest takes
    // [abc] (score -5e6); Viterbi compares [abc] vs [ab c] =
    // -1e6 + -2e6 = -3e6 and must take [ab c].
    val v = Seq(
      ("a", 1, 10L, -4000000L), ("b", 1, 10L, -4000000L),
      ("c", 1, 10L, -2000000L), ("ab", 2, 10L, -1000000L),
      ("abc", 3, 10L, -5000000L))
      .toDF("piece", "plen", "c", "score_micro")
    val out = Unigram.encodeWords(Seq("abc").toDF("word"), v)
      .as[(String, String, Long, Long)].collect()
    assert(out === Array(("abc", "ab c", 2L, -3000000L)))
  }

  test("tie-break: equal total scores prefer the shortest last piece") {
    // "ab": [ab] = -3e6 and [a b] = -1e6 + -2e6 = -3e6 tie. The packed
    // key prefers the LARGER previous position -> last piece "b" (from
    // pos 1), i.e. [a b].
    val v = Seq(
      ("a", 1, 1L, -1000000L), ("b", 1, 1L, -2000000L),
      ("ab", 2, 1L, -3000000L))
      .toDF("piece", "plen", "c", "score_micro")
    val out = Unigram.encodeWords(Seq("ab").toDF("word"), v)
      .as[(String, String, Long, Long)].collect()
    assert(out === Array(("ab", "a b", 2L, -3000000L)))
  }

  test("corpus-derived vocab segments every admissible word; pieces reassemble the word") {
    val docs = docsOf("the quick brown fox", "the the quick jumps",
      "internationalization is a very long single word here")
    val v = Unigram.vocab(docs, "doc_id", "text", minCount = 2L)
    val words = docs.select(explode(split(col("text"), " ")).as("word"))
    val enc = Unigram.encodeWords(words, v).collect()
    val byWord = enc.map(r => r.getString(0) ->
      (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(byWord.keySet === words.as[String].collect().toSet)
    byWord.foreach { case (w, (seg, np, s)) =>
      if (w.length <= Unigram.MaxWordLen) {
        assert(seg.replace(" ", "") === w, s"pieces of '$w' do not reassemble")
        assert(np === seg.split(" ").length.toLong)
        assert(s < 0)
      } else {
        assert(seg === w && np === 1L && s === Unigram.UnkScoreMicro)
      }
    }
    // the 20-char word took the OOV path
    assert(byWord("internationalization")._3 === Unigram.UnkScoreMicro)
  }

  test("encode: per-doc reassembly, counts, and additive scores") {
    val docs = docsOf("aa ab", "ab")
    val v = Unigram.vocab(docs, "doc_id", "text", minCount = 1L)
    val wordScores = Unigram.encodeWords(
      docs.select(explode(split(col("text"), " ")).as("word")), v)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val out = Unigram.encode(docs, "doc_id", "text", v)
      .orderBy("id").as[(Long, Long, Long, Long, String)].collect()
    val (aaSeg, aaNp, aaS) = wordScores("aa")
    val (abSeg, abNp, abS) = wordScores("ab")
    assert(out(0) === ((0L, 2L, aaNp + abNp, aaS + abS, s"$aaSeg $abSeg")))
    assert(out(1) === ((1L, 1L, abNp, abS, abSeg)))
  }

  test("refineVocab: hand-computed hard-EM recount, singles floor, re-quantized scores") {
    // corpus "ab ab b": seed vocab (minCount=2) = a:2, b:3, ab:2, total 7.
    // Viterbi("ab"): [ab] = ln(2/7) beats [a b] = ln(2/7)+ln(3/7) -> usage ab=2;
    // Viterbi("b") -> usage b=1. Singles floor: a -> 1. kept = a:1, b:1, ab:2,
    // total 4 -> scores ln(1/4), ln(1/4), ln(2/4).
    val docs = docsOf("ab ab b")
    val v0 = Unigram.vocab(docs, "doc_id", "text", minCount = 2L)
    val v1 = Unigram.refineVocab(docs, "doc_id", "text", v0, iters = 1)
      .orderBy("piece").as[(String, Int, Long, Long)].collect().toSeq
    def sc(c: Long, t: Long) = math.round(math.log(c.toDouble / t) * 1e6)
    assert(v1 === Seq(("a", 1, 1L, sc(1, 4)), ("ab", 2, 2L, sc(2, 4)),
      ("b", 1, 1L, sc(1, 4))))
  }

  test("refineVocab prunes multi-char pieces the Viterbi never uses") {
    // hand-built seed: "ab" scored so badly that [a b] always wins ->
    // usage(ab) = 0 -> pruned; singles survive on the floor
    val docs = docsOf("ab ab")
    val v0 = Seq(("a", 1, 1L, -1000000L), ("b", 1, 1L, -1000000L),
      ("ab", 2, 1L, -9000000L)).toDF("piece", "plen", "c", "score_micro")
    val v1 = Unigram.refineVocab(docs, "doc_id", "text", v0, iters = 1)
    assert(v1.select("piece").as[String].collect().toSet === Set("a", "b"))
  }

  test("refineVocab: encode under the refined model still reassembles; iters=2 deterministic") {
    val docs = docsOf("the quick brown fox", "the the quick jumps",
      "quick brown brown the")
    val v0 = Unigram.vocab(docs, "doc_id", "text", minCount = 2L)
    val v2a = Unigram.refineVocab(docs, "doc_id", "text", v0, iters = 2)
      .collect().map(_.toString).sorted.toSeq
    val v2b = Unigram.refineVocab(docs.repartition(5), "doc_id", "text", v0, iters = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(v2a === v2b)
    val v1 = Unigram.refineVocab(docs, "doc_id", "text", v0, iters = 1)
    val enc = Unigram.encodeWords(
      docs.select(explode(split(col("text"), " ")).as("word")), v1).collect()
    enc.foreach { r =>
      assert(r.getString(1).replace(" ", "") === r.getString(0))
    }
  }

  test("encodeWords is partition-invariant") {
    val docs = docsOf("the quick brown fox", "the the quick jumps over lazy dogs",
      "quick quick brown")
    val v = Unigram.vocab(docs, "doc_id", "text", minCount = 2L)
    def run(parts: Int) = {
      val words = docs.repartition(parts)
        .select(explode(split(col("text"), " ")).as("word"))
      Unigram.encodeWords(words, v).collect().map(_.toString).sorted.toSeq
    }
    assert(run(1) === run(5))
  }
}
