package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a document in one native pass: tokenize, hash each
  * token, accumulate 64 signed bit-sums, emit the sign bits — a single
  * static kernel call per row from generated code. Replaces the composable
  * explode + groupBy(64 conditional sums) formulation (which shuffles
  * |docs|·64 ints and pays per-token expression evaluation).
  *
  * Weighted by token multiplicity (repeated tokens count repeatedly),
  * matching the classic Charikar construction.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects string, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  /** Tight-loop kernel (public static for generated code). */
  def compute(text: UTF8String): Long = {
    val toks = Ws.Pattern.split(text.toString)
    val sums = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(toks(t)), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
