package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.WinnowPositions
import graft.text.Winnow

/** Pins the O(n) rolling-hash winnowing expression against an
  * independent quadratic reference (from-scratch mod-P polynomial per
  * position + O(w) min scan), plus the selection contract.
  */
class WinnowPositionsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- independent reference: no rolling update, no deque; BigInt
  // arithmetic so a modular-arithmetic slip in the expression's long
  // math (a missed floorMod, an overflowing intermediate) cannot be
  // replicated here ----
  private def reference(s: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Seq.empty
    def lane(p: Int, b: Long, mod: Long): Long =
      (0 until k).foldLeft(BigInt(0)) { (h, j) =>
        (h * b + cps(p + j)) mod mod
      }.toLong
    val hf = (0 until m).map { p =>
      lane(p, WinnowPositions.B1, WinnowPositions.P1) * WinnowPositions.P2 +
        lane(p, WinnowPositions.B2, WinnowPositions.P2)
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

  test("multibyte input: code-point positions stay in range, match reference") {
    val s = "héllo wörld — ünïcode text with some ascii tail padding"
    val nCps = s.codePointCount(0, s.length)
    val out = run(s)
    assert(out.nonEmpty)
    assert(out.forall { case (p, _) => p >= 0 && p <= nCps - 16 })
    assert(out === reference(s, 16, 8))
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
