package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined token-span chunks — the native kernel form of
  * [[graft.scale.Curation.spanChunks]]: cut the whitespace token stream
  * AFTER every token whose md5 hex opens with '0' (a deterministic 1/16
  * boundary rate), emitting struct(n_tokens, chunk) per span with the
  * tokens re-joined by single spaces.
  *
  * Exists because the composable HOF formulation (nested
  * transform/filter/zip_with with a per-token md5) runs as interpreted
  * lambdas — ~0.5 ms/row on the driver corpus, and the span-dedup pipeline
  * evaluates it up to three times (inventory, winner join-back, rebuild).
  * One static kernel call per row keeps the whole chunking inside
  * whole-stage codegen; the HOF form stays as the semantic reference
  * (CurationSpec parity law) and as the documentation of the SQL-replayable
  * rule the q87 oracle unrolls.
  *
  * The boundary test `md5(w) < '1'` on hex strings is exactly "first md5
  * byte's high nibble is zero" — compared here on the raw digest byte, no
  * hex encoding.
  */
case class SpanChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"span_chunks expects string, got $t")
  }

  override def dataType: DataType = SpanChunks.OutType

  override def prettyName: String = "span_chunks"

  override protected def nullSafeEval(input: Any): Any =
    SpanChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SpanChunks.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanChunks {

  val OutType: ArrayType = ArrayType(StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunk", StringType, nullable = false))), containsNull = false)

  /** Kernel (public static for generated code): one pass over the tokens,
    * one MD5 per token (first digest byte decides the boundary), spans
    * re-joined with single spaces.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val toks = Ws.Pattern.split(text.toString).filter(_.nonEmpty)
    val n = toks.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.max(4, n / 16))
    var start = 0
    var i = 0
    while (i < n) {
      val digest = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val boundary = (digest(0) & 0xF0) == 0
      if (boundary || i == n - 1) {
        val sb = new java.lang.StringBuilder
        var j = start
        while (j <= i) {
          if (j > start) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out += new GenericInternalRow(Array[Any](
          (i - start + 1).toLong, UTF8String.fromString(sb.toString)))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
