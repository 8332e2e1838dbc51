package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Runtime-looped product-quantization kernels (Jégou, Douze, Schmid 2011 —
  * the same public ADC construction as [[graft.similarity.Pq]]).
  *
  * Why custom expressions instead of the composed
  * `array_min(array(struct(round(selfdot − 2·dot + bb, 6), j), …))` /
  * `explode(array(struct(s, j, lutv), …))` forms: at m=4, ksub=16 those
  * UNROLL m·ksub = 64 literal-codebook dot products into ONE generated
  * Java method — janino's 64 KB method limit trips
  * (`InternalCompilerException: Code grows beyond 64 KB`), whole-stage
  * codegen silently falls back to interpreted, and the hot ANN scoring
  * path runs un-compiled exactly where it matters (12 such fallbacks per
  * PQ suite run, round-13 verdict finding #1). Here the codebook lives in
  * the references array as plain `double[][]` and the generated code is a
  * SMALL constant-size loop nest — the per-row work is identical FLOPs,
  * the generated method is ~1 KB regardless of m·ksub, and the stage
  * stays inside WholeStageCodegen.
  *
  * Bit-compatibility contract (pinned by PqSpec against the retained
  * unrolled forms): element reads widen float→double exactly like
  * [[DotProduct]]; dots accumulate left-to-right; `bb = Σ bv²` is folded
  * left-to-right at CONSTRUCTION time (the same `bv.map(x*x).sum` the
  * unrolled form folds at plan build); rounding replays Spark's
  * `Round(HALF_UP)` double semantics (`BigDecimal.valueOf(x).setScale(n,
  * HALF_UP)`); argmin ties break on the smaller code index (strict `<`
  * over ascending j ≡ `array_min` struct ordering, since a rounded d² is
  * never NaN/−0.0).
  */
object PqKernels {

  /** Spark `round(x, 6)` on doubles, verbatim (RoundBase HALF_UP). */
  def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark `round(x)` (scale 0) on doubles, verbatim. */
  def round0(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  import org.apache.spark.sql.graftbridge

  private def validated(books: Seq[Seq[Seq[Double]]]): Seq[Seq[Seq[Double]]] = {
    require(books.nonEmpty && books.head.nonEmpty && books.head.head.nonEmpty &&
      books.forall(b => b.length == books.head.length &&
        b.forall(_.length == books.head.head.length)),
      s"ragged codebooks: m=${books.length}")
    books
  }

  /** `codes(s) = argmin_j round6(‖sub_s − bv_{s,j}‖²)` as array<int>. */
  def codes(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    graftbridge.column(PqEncodeCodes(graftbridge.expression(vec), validated(books)))

  /** Flat ADC lookup table as array<long>: slot `s·ksub + j` holds
    * `cast(round((‖sub_s − bv_{s,j}‖²) · 10⁶) as long)` — the caller
    * posexplodes and derives (s, j) from the slot index.
    */
  def lut(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    graftbridge.column(PqLutRow(graftbridge.expression(vec), validated(books)))
}

/** Shared shape/codegen for the two kernels. `books` is m × ksub × dsub
  * (validated rectangular by the [[PqKernels]] builders).
  *
  * IMPORTANT: this abstract class's primary constructor is the first
  * NON-serializable ancestor of the concrete case classes (Catalyst
  * `TreeNode` is not `Serializable`; only the case-class leaves are), so
  * Java deserialization on executors re-runs THIS constructor with every
  * abstract member still null — the body must therefore contain no
  * statements touching `books` (everything below is a def or lazy val).
  */
abstract class PqKernelBase extends UnaryExpression {
  def child: Expression
  def books: Seq[Seq[Seq[Double]]]

  protected def m: Int = books.length
  protected def ksub: Int = books.head.length
  protected def dsub: Int = books.head.head.length

  // reference-array payloads: entry s*ksub + j
  @transient protected lazy val bvs: Array[Array[Double]] =
    books.flatMap(_.map(_.toArray)).toArray
  // Σ bv², folded left-to-right like the unrolled form's driver-side sum
  @transient protected lazy val bbs: Array[Double] =
    books.flatMap(_.map(bv => bv.map(x => x * x).sum)).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq kernel needs array<float|double> input, got ${t.sql}")
  }

  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def getElem(a: ArrayData, i: Int): Double =
    if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** PQ encode: array<int> of the m argmin codebook indices. */
case class PqEncodeCodes(child: Expression, books: Seq[Seq[Seq[Double]]])
  extends PqKernelBase {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      val len = math.min(dsub, math.max(0, n - base))
      var selfDot = 0.0
      var t = 0
      while (t < len) { val x = getElem(a, base + t); selfDot += x * x; t += 1 }
      var bestD = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < ksub) {
        val bv = bvs(s * ksub + j)
        var dot = 0.0
        t = 0
        while (t < len) { dot += getElem(a, base + t) * bv(t); t += 1 }
        val d = PqKernels.round6(selfDot - 2.0 * dot + bbs(s * ksub + j))
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bvsRef = ctx.addReferenceObj("pqBvs", bvs, "double[][]")
      val bbsRef = ctx.addReferenceObj("pqBbs", bbs, "double[]")
      val (n, codes, s, base, len, selfDot, t, x, bestD, bestJ, j, bv, dot, d) =
        (ctx.freshName("n"), ctx.freshName("codes"), ctx.freshName("s"),
          ctx.freshName("base"), ctx.freshName("len"), ctx.freshName("selfDot"),
          ctx.freshName("t"), ctx.freshName("x"), ctx.freshName("bestD"),
          ctx.freshName("bestJ"), ctx.freshName("j"), ctx.freshName("bv"),
          ctx.freshName("dot"), ctx.freshName("d"))
      val get = (i: String) =>
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $dsub;
         |  int $len = Math.min($dsub, Math.max(0, $n - $base));
         |  double $selfDot = 0.0;
         |  for (int $t = 0; $t < $len; $t++) {
         |    double $x = ${get(s"$base + $t")};
         |    $selfDot += $x * $x;
         |  }
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $bestJ = 0;
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double[] $bv = $bvsRef[$s * $ksub + $j];
         |    double $dot = 0.0;
         |    for (int $t = 0; $t < $len; $t++) {
         |      $dot += ${get(s"$base + $t")} * $bv[$t];
         |    }
         |    double $d = graft.functions.PqKernels.round6(
         |      $selfDot - 2.0 * $dot + $bbsRef[$s * $ksub + $j]);
         |    if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
         |  }
         |  $codes[$s] = $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** Per-row flat ADC LUT: array<long> of m·ksub micro-unit d² entries. */
case class PqLutRow(child: Expression, books: Seq[Seq[Seq[Double]]])
  extends PqKernelBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val lut = new Array[Long](m * ksub)
    var s = 0
    while (s < m) {
      val base = s * dsub
      val len = math.min(dsub, math.max(0, n - base))
      var selfDot = 0.0
      var t = 0
      while (t < len) { val x = getElem(a, base + t); selfDot += x * x; t += 1 }
      var j = 0
      while (j < ksub) {
        val bv = bvs(s * ksub + j)
        var dot = 0.0
        t = 0
        while (t < len) { dot += getElem(a, base + t) * bv(t); t += 1 }
        lut(s * ksub + j) = PqKernels.round0(
          (selfDot - 2.0 * dot + bbs(s * ksub + j)) * 1e6).toLong
        j += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bvsRef = ctx.addReferenceObj("pqBvs", bvs, "double[][]")
      val bbsRef = ctx.addReferenceObj("pqBbs", bbs, "double[]")
      val (n, lut, s, base, len, selfDot, t, x, j, bv, dot) =
        (ctx.freshName("n"), ctx.freshName("lut"), ctx.freshName("s"),
          ctx.freshName("base"), ctx.freshName("len"), ctx.freshName("selfDot"),
          ctx.freshName("t"), ctx.freshName("x"), ctx.freshName("j"),
          ctx.freshName("bv"), ctx.freshName("dot"))
      val get = (i: String) =>
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |long[] $lut = new long[${m * ksub}];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $dsub;
         |  int $len = Math.min($dsub, Math.max(0, $n - $base));
         |  double $selfDot = 0.0;
         |  for (int $t = 0; $t < $len; $t++) {
         |    double $x = ${get(s"$base + $t")};
         |    $selfDot += $x * $x;
         |  }
         |  for (int $j = 0; $j < $ksub; $j++) {
         |    double[] $bv = $bvsRef[$s * $ksub + $j];
         |    double $dot = 0.0;
         |    for (int $t = 0; $t < $len; $t++) {
         |      $dot += ${get(s"$base + $t")} * $bv[$t];
         |    }
         |    $lut[$s * $ksub + $j] = (long) graft.functions.PqKernels.round0(
         |      ($selfDot - 2.0 * $dot + $bbsRef[$s * $ksub + $j]) * 1.0E6);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLutRow =
    copy(child = newChild)
}
