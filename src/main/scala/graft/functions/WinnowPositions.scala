package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass winnowing: selected fingerprint positions of a
  * document in ONE O(n) walk — a two-lane mod-P polynomial rolling hash
  * (O(1) per position: push one code point, retire one via the
  * precomputed `B^(k-1) mod P` term) and a monotonic-deque sliding
  * minimum over the symmetric `2w-1` window. Returns
  * `array<struct<pos:int, h:bigint>>` — one element per position whose
  * hash equals its neighborhood minimum (ties all selected, matching
  * [[graft.text.Winnow.fingerprints]] semantics).
  *
  * Why a custom expression: the declarative form pays an md5 over a
  * k-char substring at EVERY position — O(k) hashing per char plus a
  * per-document window sort, ~150 M md5 calls per 100×-corpus pass
  * (242 s in the round-10 soak). This expression is the 100 TB path:
  * same selection CONTRACT (local-minimum, self-synchronizing,
  * guaranteed shared fingerprints for shared runs ≥ k+w−1 chars, ~1/w
  * density), different hash family, so fingerprints from the two forms
  * are not interchangeable — pick one per corpus.
  *
  * Hash family — chosen for ENGINE REPLAYABILITY: each lane is a plain
  * polynomial over code points, `h = Σ cp·B^j mod P`, with `P < 2^31`,
  * so any engine with 64-bit integers and `%` can recompute a position
  * hash from the k-gram (intermediates stay ≤ (P−1)·B + cp < 2^52 — no
  * wrapping arithmetic anywhere). Two independent (B, P) lanes combined
  * as `h1·P2 + h2` give a ~62-bit fingerprint space (single-lane 31-bit
  * would birthday-collide at ~10^5 fingerprints — far too small for a
  * corpus-scale join key). That makes q_winnow_fast DuckDB-oracle-
  * checkable — the gate replays both Horner chains with
  * `unicode(substr(...))` and the selection with a window MIN — where
  * the previous wrapping-64-bit + splitmix64 family could not be
  * replayed (SQL integer overflow errors rather than wraps).
  *
  * Positions and k-gram widths are CODE-POINT based (≡ char positions
  * in any SQL engine's `substr`/`length`; ≡ byte positions on ASCII
  * corpora).
  */
case class WinnowPositions(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, s"k=$k: shingle width must be >= 1")
  require(w >= 2, s"w=$w: window must be >= 2")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_positions needs a string input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    WinnowPositions.select(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call — the O(n) walk lives in compiled bytecode either
    // way, and delegating keeps interpreted and codegen paths identical
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowPositions$$.MODULE$$.select($c, $k, $w);")

  override protected def withNewChildInternal(c: Expression): WinnowPositions =
    copy(child = c)
}

object WinnowPositions {
  // two independent polynomial lanes, each mod a prime < 2^31 — public
  // constants shared with the DuckDB oracle replay in SparkEntry
  val P1 = 2147483629L
  val B1 = 1000003L
  val P2 = 2147483587L
  val B2 = 1000033L

  /** Shared by interpreted eval and generated code. */
  def select(text: UTF8String, k: Int, w: Int): ArrayData = {
    val str = text.toString
    // decode UTF-16 to code points once: positions/k-grams are
    // code-point indexed, matching SQL substr/length semantics
    val nUtf16 = str.length
    val cps = new Array[Int](str.codePointCount(0, nUtf16))
    var ci = 0
    var si = 0
    while (si < nUtf16) {
      val cp = str.codePointAt(si)
      cps(ci) = cp; ci += 1; si += Character.charCount(cp)
    }
    val n = cps.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // B^(k-1) mod P per lane, for the retire step
    var pow1 = 1L
    var pow2 = 1L
    var i = 1
    while (i < k) { pow1 = pow1 * B1 % P1; pow2 = pow2 * B2 % P2; i += 1 }
    val hf = new Array[Long](m)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < k) {
      h1 = (h1 * B1 + cps(i)) % P1
      h2 = (h2 * B2 + cps(i)) % P2
      i += 1
    }
    hf(0) = h1 * P2 + h2
    i = 1
    while (i < m) {
      val out = cps(i - 1)
      val in = cps(i + k - 1)
      h1 = (java.lang.Math.floorMod(h1 - out * pow1 % P1, P1) * B1 + in) % P1
      h2 = (java.lang.Math.floorMod(h2 - out * pow2 % P2, P2) * B2 + in) % P2
      hf(i) = h1 * P2 + h2
      i += 1
    }
    // monotonic-deque sliding min over the symmetric [i-w+1, i+w-1]
    // window; a position is selected iff its hash equals the window min
    val deque = new Array[Int](m) // indices with non-decreasing hf
    var head = 0
    var tail = 0 // exclusive
    var added = 0 // next index to push
    val out = new scala.collection.mutable.ArrayBuffer[Any](m / w + 1)
    i = 0
    while (i < m) {
      val hi = math.min(m - 1, i + w - 1)
      val lo = math.max(0, i - w + 1)
      while (added <= hi) {
        while (tail > head && hf(deque(tail - 1)) > hf(added)) tail -= 1
        deque(tail) = added; tail += 1; added += 1
      }
      while (deque(head) < lo) head += 1
      if (hf(i) == hf(deque(head)))
        out += new GenericInternalRow(Array[Any](i, hf(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftbridge

  /** Column-level entry point. */
  def winnowPositions(text: Column, k: Int, w: Int): Column =
    graftbridge.column(WinnowPositions(graftbridge.expression(text), k, w))
}
