package graft

import org.apache.spark.sql.functions._

import graft.text.WordPiece

class WordPieceSpec extends SparkTestBase {
  import spark.implicits._

  // words: hello ×2, world ×1 — at minCount=2 only hello's prefixes and
  // continuation bigrams clear the threshold
  private val docs = Seq(
    (1L, "hello world"),
    (2L, "hello")).toDF("doc_id", "text")

  private def vocabSet = WordPiece.vocab(docs, "doc_id", "text", maxPrefix = 4, minCount = 2L)

  test("vocab: singles give coverage, thresholds gate prefixes and bigrams") {
    val v = vocabSet.as[(String, Int)].collect().toMap
    // initial singles + continuation singles are unconditional (coverage)
    assert(Set("h", "w").forall(v.get(_).contains(1)))
    assert(Set("##e", "##l", "##o", "##r", "##d").forall(v.get(_).contains(1)))
    // hello's prefixes (occurrence-weighted count 2) pass; world's (1) fail
    assert(v.get("he").contains(2) && v.get("hel").contains(3) && v.get("hell").contains(4))
    assert(!v.contains("wo") && !v.contains("wor"))
    // continuation bigrams: hello's interior pass, world's fail
    assert(Set("##el", "##ll", "##lo").forall(v.get(_).contains(2)))
    assert(!v.contains("##or") && !v.contains("##rl"))
    // 2 initial singles + 5 continuation singles + 3 prefixes + 3 bigrams
    assert(v.size === 13)
  }

  test("encodeWords: greedy longest-match-first with ## continuations") {
    val enc = WordPiece.encodeWords(
      Seq("hello", "world").toDF("word"), vocabSet)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc === Map(
      "hello" -> (("hell ##o", 2L)),
      "world" -> (("w ##o ##r ##l ##d", 5L))))
  }

  test("encodeWords: whole-word [UNK] on unmatched char and on overlong words") {
    val enc = WordPiece.encodeWords(
      Seq("xyz", "hello", "hellohellohellohello").toDF("word"), vocabSet, maxWordLen = 16)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc("xyz") === (("[UNK]", 1L)))           // 'x' matches nothing
    assert(enc("hello") === (("hell ##o", 2L)))
    assert(enc("hellohellohellohello") === (("[UNK]", 1L))) // len 20 > 16
  }

  test("encodeWords: mid-word failure falls back to whole-word [UNK], not a partial") {
    // 'worldz': w ##o ##r ##l ##d match, then 'z' at pos 6 — ##z absent
    val enc = WordPiece.encodeWords(Seq("worldz").toDF("word"), vocabSet)
      .as[(String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(enc("worldz") === (("[UNK]", 1L)))
  }

  test("encode: per-doc piece stream preserves token order") {
    val out = WordPiece.encode(docs, "doc_id", "text", vocabSet)
      .orderBy("id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 7L, "hell ##o w ##o ##r ##l ##d"),
      (2L, 1L, 2L, "hell ##o")))
  }

  test("encode is partition-invariant") {
    val corpus = (0L until 40L)
      .map(i => (i, s"alpha${i % 3} beta gamma${i % 5}"))
      .toDF("doc_id", "text")
    def run(parts: Int) = {
      val d = corpus.repartition(parts)
      val v = WordPiece.vocab(d, "doc_id", "text", maxPrefix = 4, minCount = 3L)
      WordPiece.encode(d, "doc_id", "text", v).orderBy("id").collect().toSeq
    }
    assert(run(1) === run(7))
  }
}
