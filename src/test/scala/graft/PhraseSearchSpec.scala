package graft

import org.apache.spark.sql.functions._

import graft.text.PhraseSearch

class PhraseSearchSpec extends SparkTestBase {
  import spark.implicits._

  test("handcrafted corpus: exact starts, overlapping matches, repeated tokens") {
    val docs = Seq(
      (1L, "a b c a b c"),      // "a b" at 1 and 4
      (2L, "a a a a"),          // "a a" overlaps: starts 1,2,3
      (3L, "b a c"),            // no "a b"
      (4L, "x a b"),            // "a b" at 2
      (5L, "a")                 // shorter than the phrase
    ).toDF("doc_id", "text")
    val ab = PhraseSearch.phraseMatches(docs, "doc_id", "text", Seq("a", "b"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(ab === Seq((1L, 2L, 1), (4L, 1L, 2)))
    val aa = PhraseSearch.phraseMatches(docs, "doc_id", "text", Seq("a", "a"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(aa === Seq((2L, 3L, 1)))
  }

  test("repeated-token phrase: every slot needs its own witness") {
    val docs = Seq(
      (1L, "table merge"),              // single 'table' — must NOT match
      (2L, "table table merge"),        // exact
      (3L, "x table table merge y"),    // exact at 2
      (4L, "table table table merge")   // 'table table merge' at 2 only
    ).toDF("doc_id", "text")
    val got = PhraseSearch.phraseMatches(docs, "doc_id", "text",
      Seq("table", "table", "merge"))
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(got === Seq((2L, 1L, 1), (3L, 1L, 2), (4L, 1L, 2)))
  }

  test("agrees with a sliding-window reference on real documents") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val phrase = Seq("table", "hash")
    val got = PhraseSearch.phraseMatches(docs, "doc_id", "text", phrase)
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    // independent reference: per-doc sliding window over the same split
    val want = docs.select("doc_id", "text").as[(Long, String)].collect().toSeq
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        val starts = (0 to toks.length - phrase.length)
          .filter(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
        if (starts.isEmpty) None else Some((id, starts.size.toLong, starts.min + 1))
      }.sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty, "fixture should contain at least one match")
  }

  test("lowercase option matches case-insensitively") {
    val docs = Seq((1L, "Foo BAR baz"), (2L, "foo bar")).toDF("doc_id", "text")
    val cs = PhraseSearch.phraseMatches(docs, "doc_id", "text", Seq("foo", "bar"))
      .as[(Long, Long, Int)].collect().toSeq
    assert(cs === Seq((2L, 1L, 1)))
    val ci = PhraseSearch.phraseMatches(docs, "doc_id", "text", Seq("Foo", "bar"),
      lowercase = true).orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(ci === Seq((1L, 1L, 1), (2L, 1L, 1)))
  }

  test("multiPhraseMatches: N phrases in one pass agree with per-phrase runs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val phrases = Seq(Seq("table", "hash"), Seq("a", "a"), Seq("big", "order"))
    val multi = PhraseSearch.multiPhraseMatches(docs, "doc_id", "text", phrases)
      .orderBy("doc_id", "phrase_id")
      .as[(Long, Int, Long, Int)].collect().toSeq
    val singles = phrases.zipWithIndex.flatMap { case (p, pid) =>
      PhraseSearch.phraseMatches(docs, "doc_id", "text", p)
        .as[(Long, Long, Int)].collect().toSeq
        .map { case (id, n, fp) => (id, pid, n, fp) }
    }.sortBy(r => (r._1, r._2))
    assert(multi === singles)
    assert(multi.map(_._2).distinct.size === 3, "every phrase should match somewhere")
  }

  test("multiPhraseMatches: shared tokens across phrases do not cross-contaminate") {
    val docs = Seq(
      (1L, "a b c"),   // "a b" yes; "b c" yes; "a c" no
      (2L, "a c b")    // "a c" yes; others no
    ).toDF("doc_id", "text")
    val got = PhraseSearch.multiPhraseMatches(docs, "doc_id", "text",
      Seq(Seq("a", "b"), Seq("b", "c"), Seq("a", "c")))
      .orderBy("doc_id", "phrase_id")
      .as[(Long, Int, Long, Int)].collect().toSeq
    assert(got === Seq(
      (1L, 0, 1L, 1), (1L, 1, 1L, 2),
      (2L, 2, 1L, 1)))
  }

  test("plan: slot lookup is a broadcast join; no shuffle join, no cartesian") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val p = PhraseSearch.phraseMatches(docs, "doc_id", "text", Seq("table", "hash"))
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sweep scale: 250 phrases in one pass, plan size constant") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // 250 synthetic benchmark prompts: a handful planted (must match), the
    // rest drawn from fixture vocabulary in orders that mostly don't occur.
    val vocab = Seq("table", "hash", "big", "order", "merge", "scan", "index",
      "join", "filter", "group", "sort", "cache", "spill", "byte", "row")
    val planted = Seq(Seq("table", "hash"), Seq("a", "a"))
    val generated = (0 until 248).map { i =>
      Seq(vocab(i % vocab.size), vocab((i / vocab.size + i) % vocab.size),
        vocab((i * 7 + 3) % vocab.size))
    }
    val phrases = planted ++ generated
    val df = PhraseSearch.multiPhraseMatches(docs, "doc_id", "text", phrases)
    // plan stays a single broadcast join regardless of phrase count
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    val got = df.orderBy("doc_id", "phrase_id")
      .as[(Long, Int, Long, Int)].collect().toSeq
    // planted phrases hit; results agree with per-phrase runs on a sample
    assert(got.exists(_._2 == 0), "planted phrase 0 should match")
    val sample = Seq(0, 1, 17, 133)
    sample.foreach { pid =>
      val single = PhraseSearch.phraseMatches(docs, "doc_id", "text", phrases(pid))
        .as[(Long, Long, Int)].collect().toSeq
        .map { case (id, n, fp) => (id, pid, n, fp) }.sortBy(_._1)
      assert(got.filter(_._2 == pid).sortBy(_._1) === single, s"phrase $pid")
    }
  }
}
