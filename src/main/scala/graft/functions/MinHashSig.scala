package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd MinHash signature over an `array<string>` shingle column:
  * slot i = min over shingles of gᵢ = h1 + i·h2, the Kirsch–Mitzenmacher
  * double-hashing family over ONE md5 per shingle (h1 = hex chars 1-15 →
  * 60 bits, h2 = chars 16-29 → 56 bits). Bit-identical to the staged
  * higher-order-function construction it replaces
  * (`array_min(transform(hs, p -> p.h1 + i*p.h2))` per slot over
  * md5/conv projections — see `NearDup.minHashSignature`, kept as the
  * semantic reference), and to the DuckDB oracle replay
  * (`list_min(list_transform(hs, p -> p.h1 + i * p.h2))`).
  *
  * Why a custom expression: the HOF form is CodegenFallback AND does
  * `numHashes` interpreted passes over the shingle array (plus two more
  * to stage md5 and the (h1, h2) split) — 18 array traversals with boxed
  * lambda dispatch per document. This is one fused loop: md5 once per
  * shingle, then `numHashes` long min-updates, no intermediate arrays.
  *
  * Empty input yields null slots (`array_min` of an empty array is NULL),
  * though the library path never produces an empty shingle array —
  * `shinglesFromTokens` falls back to the whole text below 3 tokens.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 16,
    s"numHashes=$numHashes: the no-overflow bound i*h2 < 2^60 needs i < 16")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs an array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    MinHashSig.sign(v.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig$$.MODULE$$.sign($c, $numHashes);")

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {

  /** Shared by interpreted eval and generated code. Null shingle elements
    * are skipped, matching the `array_min` null-skip of the HOF reference
    * form (reachable: `shinglesFromTokens` falls back to `array(text)`,
    * which holds a single null element when `text` is null). An array
    * with no non-null element yields null slots, as `array_min` of an
    * all-null array is NULL.
    */
  def sign(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var contributed = false
    var s = 0
    while (s < n) {
      if (!shingles.isNullAt(s)) {
        contributed = true
        // h1 = hex chars 1-15 (digest bytes 0-7 big-endian >>> 4),
        // h2 = hex chars 16-29 (bytes 7-14 big-endian, outer nibbles
        // dropped) — same bits the hex-substring/parseLong form read,
        // without the per-shingle hex string
        val d = Md5Long.digest(shingles.getUTF8String(s).getBytes)
        val h1 = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        val h2 = ((((d(7) & 0xffL) << 56) | ((d(8) & 0xffL) << 48) |
          ((d(9) & 0xffL) << 40) | ((d(10) & 0xffL) << 32) |
          ((d(11) & 0xffL) << 24) | ((d(12) & 0xffL) << 16) |
          ((d(13) & 0xffL) << 8) | (d(14) & 0xffL)) >>> 4) & ((1L << 56) - 1)
        var i = 0
        var g = h1 // h1 + i*h2, accumulated additively
        while (i < numHashes) {
          if (g < mins(i)) mins(i) = g
          g += h2
          i += 1
        }
      }
      s += 1
    }
    if (!contributed) return new GenericArrayData(new Array[Any](numHashes)) // null slots
    new GenericArrayData(mins)
  }

  import org.apache.spark.sql.graftbridge

  /** Column-level entry point. */
  def sig(shingles: Column, numHashes: Int): Column =
    graftbridge.column(MinHashSig(graftbridge.expression(shingles), numHashes))
}
