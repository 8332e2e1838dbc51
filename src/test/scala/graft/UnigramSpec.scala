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
