package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Codegen'd dot product over `array<float>` / `array<double>` columns.
  *
  * Why a custom Catalyst expression (SURVEY.md §4 said parity needs none —
  * this is a north-star hot path): the higher-order-function formulation
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is CodegenFallback — every
  * row pays interpreted lambda dispatch plus a materialized intermediate
  * array. This expression compiles to a tight Java loop inside
  * WholeStageCodegen: no allocation, no virtual calls — the difference
  * between CPU-bound and overhead-bound ANN scoring at 100 TB.
  *
  * Semantics: elements are widened to double before multiply (identical to
  * casting the array element-wise first, so oracle results are unchanged).
  * Mismatched lengths use the common prefix; null *elements* are read as
  * 0.0 (embedding columns contract: no null elements).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh identifiers: several DotProducts can land in one codegen
      // method scope (non-nullable inputs skip the scoping braces), and
      // fixed names would be duplicate declarations → janino failure →
      // silent interpreted fallback
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val getL = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getL * $getR;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {
  import org.apache.spark.sql.graftbridge

  /** Column-level entry point (classic-API Column↔Expression bridge). */
  def dot(a: Column, b: Column): Column =
    graftbridge.column(DotProduct(graftbridge.expression(a), graftbridge.expression(b)))
}

/** Session extension registering the library's codegen'd expressions for
  * SQL users — `vec_dot(a, b)`, `minhash_sig(shingles, k)`,
  * `ngrams(tokens, n)` — install with `.withExtensions(new
  * GraftExtensions)` or `spark.sql.extensions=graft.functions
  * .GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** The int a SQL-literal argument folds to (`minhash_sig(sh, 16)`),
    * with a named error when a non-literal sneaks in.
    */
  private def litInt(e: Expression, fn: String, arg: String): Int =
    if (e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType) {
      // a foldable NULL (e.g. CAST(NULL AS INT)) evals to null, and
      // null.asInstanceOf[Int] unboxes to 0 — silently bypassing the
      // named error with a nonsense parameter
      val v = e.eval()
      if (v == null) throw new IllegalArgumentException(
        s"$fn: $arg must be a non-NULL integer literal, got ${e.sql}")
      v.asInstanceOf[Int]
    } else throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${e.sql}")

  /** Readable arity error instead of an IndexOutOfBoundsException when a
    * SQL call passes the wrong number of arguments.
    */
  private def arity(children: Seq[Expression], fn: String, n: Int,
                    signature: String): Unit =
    if (children.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments: $signature; got ${children.length}")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        arity(children, "vec_dot", 2, "vec_dot(a, b)")
        DotProduct(children.head, children(1))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        arity(children, "minhash_sig", 2, "minhash_sig(shingles, numHashes)")
        MinHashSig(children.head,
          litInt(children(1), "minhash_sig", "numHashes"))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NgramArray].getName, "ngrams"),
      (children: Seq[Expression]) => {
        arity(children, "ngrams", 2, "ngrams(tokens, n)")
        NgramArray(children.head, litInt(children(1), "ngrams", "n"))
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[Md5Long].getName, "md5_long"),
      (children: Seq[Expression]) => {
        arity(children, "md5_long", 1, "md5_long(s)")
        Md5Long(children.head)
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("md5_long64"),
      new ExpressionInfo(classOf[Md5Long64].getName, "md5_long64"),
      (children: Seq[Expression]) => {
        arity(children, "md5_long64", 1, "md5_long64(s)")
        Md5Long64(children.head)
      }))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("winnow_positions"),
      new ExpressionInfo(classOf[WinnowPositions].getName, "winnow_positions"),
      (children: Seq[Expression]) => {
        arity(children, "winnow_positions", 3, "winnow_positions(tokens, k, w)")
        WinnowPositions(children.head,
          litInt(children(1), "winnow_positions", "k"),
          litInt(children(2), "winnow_positions", "w"))
      }))
    e.injectOptimizerRule(_ => graft.plans.ShareWindowExchange)
  }
}
