package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.WinnowPositions
import graft.text.Winnow

/** Pins the O(n) rolling-hash winnowing expression against an
  * independent quadratic reference (from-scratch polynomial per
  * position + O(w) min scan), plus the selection contract.
  */
class WinnowPositionsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- independent reference: no rolling update, no deque ----
  private val Base = 0x100000001b3L
  private def mixRef(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }
  private def reference(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val b = s.getBytes("UTF-8")
    val m = b.length - k + 1
    if (m <= 0) return Seq.empty
    val hf = (0 until m).map { p =>
      var h = 0L
      var j = 0
      while (j < k) { h = h * Base + (b(p + j) & 0xffL); j += 1 }
      mixRef(h)
    }
    (0 until m).flatMap { i =>
      val lo = math.max(0, i - w + 1)
      val hi = math.min(m - 1, i + w - 1)
      if (hf(i) == (lo to hi).map(hf).min) Some((i, hf(i))) else None
    }
  }

  private def run(s: String, k: Int = 16, w: Int = 8): Seq[(Int, Long)] = {
    val arr = WinnowPositions.select(UTF8String.fromString(s), k, w)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getInt(0), r.getLong(1))
    }
  }

  test("rolling+deque == from-scratch+linear-scan on varied strings") {
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",      // all-tie pathologies
      "abcdabcdabcdabcdabcdabcdabcd",              // periodic
      (1 to 200).map(i => ('a' + i % 26).toChar).mkString,
      "exactly sixteen!",                          // m == 1
      "short",                                     // m <= 0
      ""
    )
    for (s <- cases; (k, w) <- Seq((16, 8), (8, 4), (4, 2), (1, 2)))
      assert(run(s, k, w) === reference(s, k, w), s"k=$k w=$w s='$s'")
  }

  test("randomized agreement (seeded)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val s = (1 to (rnd.nextInt(300) + 1))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString // heavy ties
      assert(run(s, 8, 5) === reference(s, 8, 5), s"s='$s'")
    }
  }

  test("multibyte input: byte positions stay in range, no crash") {
    val s = "héllo wörld — ünïcode text with some ascii tail padding"
    val nBytes = s.getBytes("UTF-8").length
    val out = run(s)
    assert(out.nonEmpty)
    assert(out.forall { case (p, _) => p >= 0 && p <= nBytes - 16 })
  }

  test("fingerprintsFast: the DataFrame form preserves the shared-run contract") {
    val shared = "the quick brown fox jumps over the lazy"
    val docs = Seq(
      (1L, s"XXXX $shared YYYY"),
      (2L, s"a totally different beginning $shared unrelated end")
    ).toDF("doc_id", "text")
    val fp = Winnow.fingerprintsFast(docs, "doc_id", "text", k = 16, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val h1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._2).toSet
    assert((h1 & h2).nonEmpty)
  }

  test("fingerprintsFast density tracks ~1/w and empty/short docs vanish") {
    val text = (1 to 80).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "tiny"), (3L, "")).toDF("doc_id", "text")
    val out = Winnow.fingerprintsFast(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
    val m = text.getBytes("UTF-8").length - 16 + 1
    assert(out(1L).length > 0 && out(1L).length < m / 2)
    assert(!out.contains(2L) && !out.contains(3L))
  }

  test("codegen and interpreted evaluation agree through the plan") {
    // force both paths over the same data: wholestage on (default) vs off
    val docs = (1L to 60L).map(i => (i, s"document body number $i " * 4))
      .toDF("doc_id", "text")
    val a = Winnow.fingerprintsFast(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = Winnow.fingerprintsFast(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(a === b)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
