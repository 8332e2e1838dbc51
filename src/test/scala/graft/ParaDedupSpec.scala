package graft

import org.apache.spark.sql.functions._

import graft.text.ParaDedup

class ParaDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    // doc 1: A | B | A  (internal repeat: second A must go)
    (1L, "alpha beta\n\nshared footer text\n\nalpha beta"),
    // doc 2: footer again (cross-doc repeat) | unique
    (2L, "shared footer text\n\nonly in two"),
    // doc 3: blank block between uniques, plus the footer once more
    (3L, "solo three\n\n\n\nshared footer text"),
    // doc 4: every block already seen -> empties out
    (4L, "alpha beta\n\nonly in two")
  ).toDF("doc_id", "text")

  test("paragraphs keeps order, index and trailing blocks") {
    val p = ParaDedup.paragraphs(docs, "doc_id", "text").orderBy("id", "pidx")
    val d3 = p.filter($"id" === 3L).select("pidx", "para").as[(Int, String)].collect()
    assert(d3.toSeq === Seq((0, "solo three"), (1, ""), (2, "shared footer text")))
    assert(p.count() === 10)
  }

  test("dedupParagraphs keeps first occurrence globally, reassembles in order") {
    val out = ParaDedup.dedupParagraphs(docs, "doc_id", "text")
      .orderBy("id")
      .select("id", "n_paras", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 2L, "alpha beta\n\nshared footer text"),
      (2L, 2L, 1L, "only in two"),
      (3L, 3L, 2L, "solo three\n\n"), // blank block survives (< minChars)
      (4L, 2L, 0L, "")))
  }

  test("removed_chars accounts for dropped blocks plus their delimiters") {
    val r = ParaDedup.dedupParagraphs(docs, "doc_id", "text")
      .filter($"id" === 1L).select("removed_chars").as[Long].head()
    // doc 1 loses "alpha beta" (10 chars) + one "\n\n" delimiter
    assert(r === 12L)
  }

  test("minChars exempts short blocks from dedup") {
    val d = Seq((1L, "ab|longer block here|ab"), (2L, "ab|longer block here"))
      .toDF("doc_id", "text")
    val out = ParaDedup.dedupParagraphs(d, "doc_id", "text", delim = "|", minChars = 3)
      .orderBy("id").select("clean_text").as[String].collect().toSeq
    // "ab" (2 chars < 3) survives everywhere; the long block dedups
    assert(out === Seq("ab|longer block here|ab", "ab"))
  }

  test("regex metacharacters in the delimiter are literal") {
    val d = Seq((1L, "a.b.a"), (2L, "a.c")).toDF("doc_id", "text")
    val out = ParaDedup.dedupParagraphs(d, "doc_id", "text", delim = ".")
      .orderBy("id").select("clean_text").as[String].collect().toSeq
    assert(out === Seq("a.b", "c"))
  }

  test("profile reports copies, docs and the kept instance") {
    val prof = ParaDedup.dupParagraphProfile(docs, "doc_id", "text")
      .orderBy("keep_id", "keep_pidx")
      .select("n_copies", "n_docs", "keep_id", "keep_pidx", "para_chars")
      .as[(Long, Long, Long, Int, Int)].collect().toSeq
    assert(prof === Seq(
      (3L, 2L, 1L, 0, 10),   // "alpha beta": docs 1 (x2) and 4
      (3L, 3L, 1L, 1, 18),   // "shared footer text": docs 1, 2, 3
      (2L, 2L, 2L, 1, 11)))  // "only in two": docs 2 and 4
  }

  test("partition invariance: same result at 1 and 7 partitions") {
    val base = ParaDedup.dedupParagraphs(docs.repartition(1), "doc_id", "text")
      .orderBy("id").collect().toSeq
    val alt = ParaDedup.dedupParagraphs(docs.repartition(7), "doc_id", "text")
      .orderBy("id").collect().toSeq
    assert(base === alt)
  }
}
