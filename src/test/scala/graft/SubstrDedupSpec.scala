package graft

import graft.text.SubstrDedup

class SubstrDedupSpec extends SparkTestBase {
  import spark.implicits._

  // window=8, stride=4 for hand-countable spans.
  private def profile(rows: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    SubstrDedup.dupSpans(rows.toDF("doc_id", "text"), "doc_id", "text",
        window = 8, stride = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("cross-document verbatim reuse is flagged; unique docs are clean") {
    // doc 1 and doc 2 share the identical 12-char text -> every span of
    // one recurs in the other; doc 3 is all-unique.
    val out = profile(Seq(
      (1L, "abcdefghijkl"),
      (2L, "abcdefghijkl"),
      (3L, "zyxwvutsrqpo")))
    // 12 chars, window 8, stride 4 -> positions 0 and 4 -> 2 spans each.
    assert(out(1L) === ((2L, 2L, 1000000L)))
    assert(out(2L) === ((2L, 2L, 1000000L)))
    assert(out(3L) === ((2L, 0L, 0L)))
  }

  test("self-repetition within one document counts as duplication") {
    // "abcdabcdabcdabcd": spans at 0,4,8 are all "abcdabcd" (dup);
    // position 8 is the last (16-8=8).
    val out = profile(Seq((1L, "abcdabcdabcdabcd")))
    assert(out(1L) === ((3L, 3L, 1000000L)))
  }

  test("partial overlap yields a fractional ppm, exact integer division") {
    // doc 1: 16 chars -> spans at 0,4,8; only the span at 0 ("ABCDEFGH")
    // recurs (in doc 2). 1 of 3 -> 333333 ppm (floor).
    val out = profile(Seq(
      (1L, "ABCDEFGHxxxxyyyy"),
      (2L, "ABCDEFGHqqqqwwww")))
    assert(out(1L) === ((3L, 1L, 333333L)))
    assert(out(2L) === ((3L, 1L, 333333L)))
  }

  test("docs shorter than the window emit no row") {
    val out = profile(Seq((1L, "short"), (2L, "longenough")))
    assert(!out.contains(1L))
    assert(out(2L)._1 === 1L) // one span at pos 0 (10-8=2 < stride)
  }

  test("partition invariance: repartitioned corpus gives identical profiles") {
    val rows = (1L to 40L).map(i => (i, s"doc $i " * 6))
    val df = rows.toDF("doc_id", "text")
    val a = SubstrDedup.dupSpans(df.repartition(13), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = SubstrDedup.dupSpans(df.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
