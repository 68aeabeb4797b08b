package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sum of per-key long values over an `array<bigint>` of probe keys: each
  * element binary-searches a driver-built SORTED `long[]` key array and, on a
  * hit, adds the value at the same index in a parallel `long[]`; misses and
  * null elements contribute nothing. This is a bag-of-words linear model
  * applied per row — the [[graft.scale.NbClassifier]] scorer uses it to turn
  * "tokens × weight table" into one codegen'd array traversal with zero
  * per-row allocation, instead of an explode + join + re-aggregate that
  * would shuffle the corpus by doc id.
  *
  * The key/value arrays ride task serialization as reference objects (the
  * [[LongSetContains]] pattern): a `map_from_arrays` literal of real-vocab
  * size would be megabytes of plan and codegen source, and `element_at`
  * inside an `aggregate` HOF runs interpreted per element.
  */
case class LongMapSum(child: Expression, keys: Array[Long], vals: Array[Long])
  extends UnaryExpression {
  require(keys.length == vals.length,
    s"keys and vals must align, got ${keys.length} vs ${vals.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"long_map_sum expects array<bigint>, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_map_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val idx = java.util.Arrays.binarySearch(keys, arr.getLong(i))
        if (idx >= 0) acc += vals(idx)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("keys", keys, "long[]")
    val vRef = ctx.addReferenceObj("vals", vals, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    int $idx = java.util.Arrays.binarySearch($kRef, $c.getLong($i));
         |    if ($idx >= 0) $acc += $vRef[$idx];
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
