package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native probes over driver-built sketches. The sketch rides along as a
  * codegen reference object (same pattern as
  * [[VectorExpressions.NearestCentroid]]'s centroid matrix): built once on
  * the driver, serialized into the plan, probed from inside whole-stage
  * codegen — no per-row boxing, no ScalaUDF envelope on the 100 TB side of
  * the scan.
  */
object SketchExpressions {

  /** `bloom.mightContain(child)` for LONG or STRING keys — matching how
    * `DataFrameStatFunctions.bloomFilter` inserted them (integrals as
    * long, strings as their UTF-8 bytes). Null-intolerant: a null key
    * yields null, which a filter drops exactly like the old udf's `false`.
    */
  case class BloomMightContain(child: Expression, bloom: BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_bloom_might_contain"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom probe requires a LONG or STRING key, got $other " +
          "(cast integral keys to long — BloomFilter.put inserted them as long)")
    }

    private def isString = child.dataType == StringType

    override protected def nullSafeEval(a: Any): Any =
      if (isString) bloom.mightContainBinary(a.asInstanceOf[UTF8String].getBytes)
      else bloom.mightContainLong(a.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom,
        "org.apache.spark.util.sketch.BloomFilter")
      if (isString)
        defineCodeGen(ctx, ev, a => s"$ref.mightContainBinary($a.getBytes())")
      else
        defineCodeGen(ctx, ev, a => s"$ref.mightContainLong($a)")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def bloomMightContain(key: Column, bloom: BloomFilter): Column =
    GraftShim.column(BloomMightContain(GraftShim.expression(key), bloom))
}
