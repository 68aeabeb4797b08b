package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe of a long key, the [[LongSetContains]]
  * reference-object pattern at the scale where even a sorted `long[]` is too
  * big to ship: a benchmark suite's 10⁸ distinct shingle hashes are ~800 MB
  * as an exact array but ~10 bits/key ≈ 125 MB as a bloom at 1% fpp. The
  * filter is built DISTRIBUTED ([[org.apache.spark.sql.DataFrameStatFunctions
  * .bloomFilter]] tree-aggregates partial bitsets — the driver never holds
  * the key set, only the final bitset), then rides task serialization as a
  * codegen reference object, keeping the probe scan-local.
  *
  * May return true for absent keys (fpp); callers MUST verify positives
  * exactly ([[graft.scale.Curation.contaminatedDocsBloom]] re-joins
  * survivors), which makes the composed result value-exact.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects bigint, got $t")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bfRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
