package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk fingerprints via a polynomial rolling hash
  * (Rabin–Karp style): slide a fixed window over the bytes, cut a chunk
  * wherever the rolling hash hits the boundary mask (plus a max-size guard),
  * and emit one 64-bit fingerprint per chunk.
  *
  * This is the fuzzy-dedup primitive whole-document hashing can't provide:
  * an insertion near the start of a document only changes the fingerprints
  * of the chunks it touches — boundaries re-synchronize downstream — so
  * shared chunk fingerprints between two documents witness shared content
  * regions. Dedup at scale: explode the fingerprints, group or self-join on
  * them (short keys, the text itself never shuffles).
  *
  * One static kernel call per row from generated code, like the other
  * graft.expressions kernels.
  */
case class RollingChunks(child: Expression, window: Int, boundaryBits: Int, maxChunk: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if window >= 2 && boundaryBits >= 1 && maxChunk > window =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"invalid parameters: window=$window boundaryBits=$boundaryBits maxChunk=$maxChunk")
    case t => TypeCheckResult.TypeCheckFailure(s"rolling_chunks expects string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "rolling_chunks"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(RollingChunks.compute(
      input.asInstanceOf[UTF8String], window, boundaryBits, maxChunk))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.RollingChunks.compute($c, $window, $boundaryBits, $maxChunk));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingChunks {
  private final val Base = 1315423911L // odd multiplier for the rolling poly

  /** Kernel (public static for generated code). Boundary condition: the low
    * `boundaryBits` bits of the rolling hash are all zero — expected chunk
    * size ≈ 2^boundaryBits bytes, hard-capped at maxChunk.
    */
  def compute(text: UTF8String, window: Int, boundaryBits: Int, maxChunk: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    val mask = (1L << boundaryBits) - 1L
    // basePowW = Base^window for removing the outgoing byte
    var basePowW = 1L
    var w = 0
    while (w < window) { basePowW *= Base; w += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Long](math.max(4, n / (1 << boundaryBits)))
    var roll = 0L
    var chunkStart = 0
    var i = 0
    while (i < n) {
      roll = roll * Base + (bytes(i) & 0xff)
      if (i >= window) roll -= basePowW * (bytes(i - window) & 0xff)
      val chunkLen = i - chunkStart + 1
      if ((i >= window - 1 && (roll & mask) == 0L && chunkLen >= window) || chunkLen >= maxChunk || i == n - 1) {
        out += XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + chunkStart,
          chunkLen, 42L)
        chunkStart = i + 1
      }
      i += 1
    }
    if (out.isEmpty) Array(XXH64.hashUnsafeBytes(bytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, 0, 42L))
    else out.toArray
  }
}
