package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership test over a `bigint` column, against
  * a filter built once on the driver (`df.stat.bloomFilter`) and shipped
  * to executors inside the expression — the row-level semi-join
  * prefilter: "might this key be in the (much smaller) build side?"
  * answered from a bitset of a few hundred MB instead of a shuffle of the
  * probe side.
  *
  * This is the manual form of the runtime-filter idea Spark itself applies
  * under `spark.sql.optimizer.runtime.bloomFilter.enabled` (Catalyst's
  * `InjectRuntimeFilter` + `BloomFilterMightContain`); owning the
  * expression lets an operator guarantee the prefilter regardless of the
  * optimizer's size/selectivity heuristics, and compose it with an exact
  * confirm join so false positives never reach the result (see
  * [[graft.text.Decontaminate.bloomFlagContaminated]]).
  *
  * The filter travels as its serialized bytes (the expression tree is
  * java-serialized to executors) and is deserialized once per task via a
  * transient lazy; codegen reaches the deserialized instance through
  * `ctx.addReferenceObj`, so the hot loop is one virtual call per row on
  * a long — no boxing, inside WholeStageCodegen.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a bigint input, got ${other.sql}")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContainLong =
    copy(child = c)
}

object BloomMightContainLong {
  import org.apache.spark.sql.graftbridge

  /** Column-level entry point: `mightContain(col, bloom)`. */
  def mightContain(key: Column, bloom: BloomFilter): Column = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    graftbridge.column(BloomMightContainLong(graftbridge.expression(key), bytes))
  }
}
