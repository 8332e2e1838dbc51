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
  * document in ONE O(n) walk — a 64-bit wrapping polynomial rolling
  * hash (O(1) per byte: push one byte, retire one byte via the
  * precomputed `B^(k-1)` term, finalize with a splitmix64 mixer) and a
  * monotonic-deque sliding minimum over the symmetric `2w-1` window.
  * Returns `array<struct<pos:int, h:bigint>>` — one element per
  * position whose finalized hash equals its neighborhood minimum (ties
  * all selected, matching [[graft.text.Winnow.fingerprints]] semantics).
  *
  * Why a custom expression: the declarative form pays an md5 over a
  * k-char substring at EVERY position — O(k) hashing per byte plus a
  * per-document window sort, ~150 M md5 calls per 100×-corpus pass
  * (242 s in the round-11 soak). This expression is the 100 TB path:
  * same selection CONTRACT (local-minimum, self-synchronizing,
  * guaranteed shared fingerprints for shared runs ≥ k+w−1 bytes, ~1/w
  * density), different hash family, so fingerprints from the two forms
  * are not interchangeable — pick one per corpus. Positions/lengths
  * are BYTE-based (UTF-8); on ASCII corpora they coincide with the
  * declarative form's char positions.
  *
  * The md5 twin stays the ORACLE path (DuckDB replays it); this one is
  * pinned by spec against an independent reference implementation plus
  * the contract properties, and by bit-equality between interpreted
  * and codegen evaluation.
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
  private val Base = 0x100000001b3L // FNV-1a prime; wrapping 64-bit poly

  /** splitmix64 finalizer, masked non-negative so min-comparisons and
    * any engine replay over signed 64-bit agree.
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  /** Shared by interpreted eval and generated code. */
  def select(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // rolling hash per position, finalized
    var pow = 1L // B^(k-1), wrapping
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val hf = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    hf(0) = mix(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + k - 1) & 0xffL)
      hf(i) = mix(h)
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
