package graft

import graft.text.Winnow

class WinnowSpec extends SparkTestBase {
  import spark.implicits._

  test("shared runs guarantee shared fingerprints (the winnowing contract)") {
    // Two docs share a 40-char run; with k=16, w=8 any shared run of
    // length >= k+w-1 = 23 must yield at least one common (pos-free)
    // fingerprint hash.
    val shared = "the quick brown fox jumps over the lazy"
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"completely different prefix text $shared and different suffix")
    ).toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "doc_id", "text", k = 16, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val h1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).nonEmpty,
      "docs sharing a 40-char run must share a winnowed fingerprint")
  }

  test("an edit far from a shared run does not disturb its fingerprints") {
    val doc = "0123456789" * 8 // 80 chars
    val edited = "X" + doc     // shift every absolute position by 1
    val a = Winnow.fingerprints(Seq((1L, doc)).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(_.getLong(2)).toSet
    val b = Winnow.fingerprints(Seq((1L, edited)).toDF("doc_id", "text"),
      "doc_id", "text").collect().map(_.getLong(2)).toSet
    // hash SETS overlap heavily even though every position moved
    assert((a & b).nonEmpty && (a & b).size >= a.size / 2)
  }

  test("density: selected positions are a small fraction of all positions") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val total = text.length - 16 + 1
    val n = Winnow.fingerprints(docs, "doc_id", "text", k = 16, w = 8).count()
    assert(n > 0 && n < total / 2, s"$n of $total positions selected")
  }

  test("cdc chunk stats: boundary count drives chunks; short docs get one chunk") {
    val docs = Seq(
      (1L, "tiny"),                       // < k -> 1 chunk
      (2L, ("lorem ipsum dolor sit amet " * 10).trim) // long doc
    ).toDF("doc_id", "text")
    val out = Winnow.cdcChunkStats(docs, "doc_id", "text", k = 16, modulus = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 4L))) // 4 chars DIV 1 chunk
    val (n2, avg2) = out(2L)
    assert(n2 >= 1L)
    assert(avg2 === 269L / n2) // text length 269, exact integer divide
  }

  test("cdc boundaries are content-anchored: a prefix edit re-aligns chunking") {
    val base = ("abcdefghij" * 12) + ("zyxwvut " * 10) // 200 chars
    val shifted = "PRE" + base
    val s1 = Winnow.cdcChunkStats(Seq((1L, base)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    val s2 = Winnow.cdcChunkStats(Seq((1L, shifted)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    // boundary COUNT may differ by the prefix region only — chunk counts
    // stay within 1 of each other because interior boundaries re-anchor
    assert(math.abs(s1.getLong(1) - s2.getLong(1)) <= 1L)
  }

  test("partition invariance for both operators") {
    val rows = (1L to 30L).map(i => (i, s"document number $i " * 5))
    val df = rows.toDF("doc_id", "text")
    val f1 = Winnow.fingerprints(df.repartition(11), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val f2 = Winnow.fingerprints(df.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(f1 === f2)
    val c1 = Winnow.cdcChunkStats(df.repartition(11), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val c2 = Winnow.cdcChunkStats(df.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(c1 === c2)
  }
}
