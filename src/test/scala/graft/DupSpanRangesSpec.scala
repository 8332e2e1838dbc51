package graft

import org.apache.spark.sql.functions._

import graft.text.SubstrDedup

class DupSpanRangesSpec extends SparkTestBase {
  import spark.implicits._

  private val block = "0123456789abcdef0123456789abcdef" // 32 chars

  test("two docs sharing one 32-char block: one exact maximal span each") {
    // block at char offset 0 in doc 1 and offset 16 in doc 2 (16 = one
    // stride, so both docs window-align on it)
    val docs = Seq(
      (1L, block + "XXXXXXXXXXXXXXXX"),          // 48 chars, block at pos 0
      (2L, "YYYYYYYYYYYYYYYY" + block),          // 48 chars, block at pos 16
      (3L, "Z" * 48)                             // self-repetitive control
    ).toDF("doc_id", "text")
    val got = SubstrDedup.dupSpanRanges(docs, "doc_id", "text", 32, 16)
      .orderBy("id", "span_start")
      .as[(Long, Int, Int, Long, Int)].collect().toSeq
    // doc 1: dup window at start 0 only -> span [1, 32]
    // doc 2: dup window at start 16 -> span [17, 48]
    // doc 3: "ZZZ..." windows at 0 and 16 are identical to each other ->
    //        both dup -> merged island [1, 48]
    assert(got === Seq(
      (1L, 1, 32, 1L, 32),
      (2L, 17, 48, 1L, 32),
      (3L, 1, 48, 2L, 48)))
  }

  test("adjacent duplicated windows merge; distant ones stay separate spans") {
    val filler1 = "A" * 32
    val filler2 = "B" * 32
    // two docs share block at positions 0 AND at position 64; the
    // middle 32 chars differ between docs (and are not self-repeated)
    val d1 = block + "CDEFGHIJKLMNOPQRSTUVWXYZ!@#$%^&*" + block
    val d2 = block + "cdefghijklmnopqrstuvwxyz9876543!" + block
    val docs = Seq((1L, d1), (2L, d2), (3L, filler1 + filler2)).toDF("doc_id", "text")
    val got = SubstrDedup.dupSpanRanges(docs, "doc_id", "text", 32, 16)
      .filter(col("id") <= 2).orderBy("id", "span_start")
      .as[(Long, Int, Int, Long, Int)].collect().toSeq
    // per doc: dup windows at 0 and 64 (not 16/32/48) -> two separate
    // spans [1,32] and [65,96]
    assert(got === Seq(
      (1L, 1, 32, 1L, 32), (1L, 65, 96, 1L, 32),
      (2L, 1, 32, 1L, 32), (2L, 65, 96, 1L, 32)))
    // with a merge gap of 3 strides (48 chars), the two islands bridge
    val bridged = SubstrDedup.dupSpanRanges(docs, "doc_id", "text", 32, 16,
      mergeGapWindows = 3)
      .filter(col("id") <= 2).orderBy("id", "span_start")
      .as[(Long, Int, Int, Long, Int)].collect().toSeq
    assert(bridged === Seq(
      (1L, 1, 96, 2L, 96),
      (2L, 1, 96, 2L, 96)))
  }

  test("span totals are consistent with the dupSpans profile") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 300)
    val profile = SubstrDedup.dupSpans(docs, "doc_id", "text", 32, 16)
      .select(col("id"), col("dup_shingles")).as[(Long, Long)].collect().toMap
    val ranges = SubstrDedup.dupSpanRanges(docs, "doc_id", "text", 32, 16)
      .groupBy("id").agg(sum("n_windows").as("nw"))
      .as[(Long, Long)].collect().toMap
    // every doc's merged ranges cover exactly its duplicated windows
    val dupDocs = profile.filter(_._2 > 0)
    assert(dupDocs.nonEmpty, "fixture should contain duplicated windows")
    assert(ranges === dupDocs.map { case (k, v) => k -> v })
  }

  test("removeDupSpans stitches exactly the kept segments") {
    val docs = Seq(
      (1L, block + "XXXXXXXXXXXXXXXX"),          // dup span [1, 32]
      (2L, "YYYYYYYYYYYYYYYY" + block),          // dup span [17, 48]
      (3L, "Z" * 48),                            // fully duplicated [1, 48]
      (4L, "unique text under window")           // untouched (short)
    ).toDF("doc_id", "text")
    val got = SubstrDedup.removeDupSpans(docs, "doc_id", "text", 32, 16)
      .orderBy("id").as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got === Seq(
      (1L, 48, 16, 32, "XXXXXXXXXXXXXXXX"),
      (2L, 48, 16, 32, "YYYYYYYYYYYYYYYY"),
      (3L, 48, 0, 48, ""),
      (4L, 24, 24, 0, "unique text under window")))
  }

  test("removeDupSpans: interior span keeps both flanks in order") {
    // shared block in the MIDDLE of both docs; distinct flanks survive
    val d1 = "HEADER_ONE_16CHR" + block + "TRAILER_ONE_16CH"
    val d2 = "header_two_16chr" + block + "trailer_two_16ch"
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val got = SubstrDedup.removeDupSpans(docs, "doc_id", "text", 32, 16)
      .orderBy("id").as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(got === Seq(
      (1L, 64, 32, 32, "HEADER_ONE_16CHR" + "TRAILER_ONE_16CH"),
      (2L, 64, 32, 32, "header_two_16chr" + "trailer_two_16ch")))
  }

  test("docs shorter than the window emit no ranges") {
    val docs = Seq((1L, "short"), (2L, block), (3L, block)).toDF("doc_id", "text")
    val got = SubstrDedup.dupSpanRanges(docs, "doc_id", "text", 32, 16)
      .select("id").as[Long].collect().toSeq.sorted
    assert(got === Seq(2L, 3L)) // 2 and 3 duplicate each other; 1 too short
  }
}
