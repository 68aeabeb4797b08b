package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact squared L2 distance over two `array<bigint>` grid-code columns as a
  * native codegen'd expression — the hot inner loop of cluster-scoped
  * semantic dedup (Kmeans.semDedup compares Σ|cell|² pairs) and any other
  * pairwise scan over [[ArgMinCentroidL2]]-style grid codes. The
  * `aggregate(zip_with(...))` HOF form allocates a zipped array and runs
  * interpreted lambdas per element; this compiles to one fused primitive
  * subtract-multiply-accumulate loop — the [[Int8DotProduct]] argument, for
  * distances. Exact: grid codes are ≤ 2¹⁰, so a squared term is ≤ 2²⁰ and
  * a long accumulator cannot overflow below 2⁴³ dimensions.
  *
  * Null/length semantics match the HOF replacement sites: null array →
  * null; arrays are consumed up to the shorter length; grid codes never
  * contain null elements ([[graft.scale.Kmeans.quantizeGrid]] emits full
  * arrays), so element nulls need no special case — a null element would
  * NPE loudly rather than silently skew a distance.
  */
case class SqDistLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sqdist_long expects (array<bigint>, array<bigint>), got ($l, $r)")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "sqdist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqDistLong {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SqDistLong].getName, "sqdist_long")
}
