package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-grams over an `array<string>` token column: element i
  * is `toks[i] ⧺ " " ⧺ … ⧺ toks[i+n-1]`; fewer than `n` tokens yields an
  * empty array.
  *
  * Why a custom expression: the higher-order-function formulation
  * `transform(sequence(1, size(t)-n+1), i -> concat_ws(' ', element_at…))`
  * is CodegenFallback — every gram pays interpreted lambda dispatch, boxed
  * index arithmetic, and per-call expression-tree evaluation, and the
  * fallback breaks the surrounding WholeStageCodegen stage. Measured on
  * the sf0.1 documents table (5 000 docs, ~260 k 3-grams) the HOF form
  * took 16.7 s where this expression takes well under a second — a ~30×
  * gap that at 100 TB is the difference between a scan-bound and an
  * interpreter-bound corpus pass. Per-element semantics are identical
  * (concat_ws skips null elements; UTF8String.concatWs does the same).
  *
  * NULL-input difference vs the HOF form: a NULL token array yields NULL
  * here (standard null-intolerant expression), where the
  * `when(size(t) >= n, …).otherwise(empty)` formulation yielded an empty
  * array (`size(NULL)` is NULL → otherwise branch). Equivalent under
  * `explode`/`explode_outer`-then-drop consumers (both produce zero gram
  * rows — every call site in this library); visible only to a consumer
  * reading `size()` of the result directly, which should coalesce.
  */
case class NgramArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n=$n: n-gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngrams needs an array<string> input, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    NgramArray.build(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call — the loop body lives in compiled bytecode either
    // way, and delegating keeps interpreted and codegen paths identical
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramArray$$.MODULE$$.build($c, $n);")

  override protected def withNewChildInternal(c: Expression): NgramArray =
    copy(child = c)
}

object NgramArray {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. */
  def build(toks: ArrayData, n: Int): ArrayData = {
    val count = toks.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftbridge

  /** Column-level entry point. */
  def ngrams(toks: Column, n: Int): Column =
    graftbridge.column(NgramArray(graftbridge.expression(toks), n))
}
