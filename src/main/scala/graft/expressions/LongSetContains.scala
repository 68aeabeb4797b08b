package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Membership test of a long against a driver-built set, shipped once per
  * task as a SORTED `long[]` reference object (the [[NearestCentroids]]
  * pattern) and probed by binary search — O(log |set|) per row with zero
  * per-row allocation.
  *
  * This exists for the "collected bounded metadata, probed per row" shape
  * ([[graft.scale.Curation.removeBoilerplate]]'s hot-paragraph set): the
  * composable alternative `array_contains(typedLit(seq), x)` embeds the
  * whole set as a plan literal — megabytes of plan and codegen source at a
  * real crawl's hot-set size, scanned linearly per row — and a broadcast
  * join would force the probe side through join planning for what is
  * semantically a scalar predicate. A reference object rides task
  * serialization exactly like a broadcast value but stays an expression, so
  * the probe keeps its codegen'd scan-local shape.
  */
case class LongSetContains(child: Expression, sorted: Array[Long])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"long_set_contains expects bigint, got $t")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "long_set_contains"

  override protected def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(sorted, input.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("sorted", sorted, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = java.util.Arrays.binarySearch($setRef, $c) >= 0;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
