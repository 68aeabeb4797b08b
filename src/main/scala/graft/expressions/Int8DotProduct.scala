package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Integer dot product over two `array<tinyint>` quantized-code columns as a
  * native codegen'd expression — the hot inner loop of the int8 rerank
  * (Similarity.quantizedTopK scores |corpus|·|queries| pairs). The built-in
  * `aggregate(zip_with(...))` form allocates a zipped array and runs
  * interpreted lambdas per element; this compiles to one fused primitive
  * loop of integer multiply-accumulates — ~50x faster on a 4M-pair 64-dim
  * sweep (graft.MicroBench, identical checksums), and ~9x faster than even
  * the native double cosine on the same pairs (1-byte vs 8-byte loads:
  * the quantization memory-bandwidth argument, measured). Exact by
  * construction: |codes| <= 127, so a long accumulator cannot overflow
  * below 2^46 dimensions.
  *
  * Null/length semantics: a null ARRAY input → null; arrays are consumed up
  * to the shorter length; a null ELEMENT contributes 0 (quantized codes
  * never contain null elements — Similarity.quantizeInt8 emits a full
  * array or a null column). Similarity.int8DotHof mirrors exactly this
  * (its coalesce drops zip_with's null padding), and the spec pins the
  * parity including a ragged pair.
  */
case class Int8DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int8_dot expects (array<tinyint>, array<tinyint>), got ($l, $r)")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "int8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Int8DotProduct {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Int8DotProduct].getName, "int8_dot")
}
