package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenization of one word under a trained merge list — the serving
  * side of [[graft.scale.Bpe.bpeMerges]]: start from characters, apply each
  * merge greedily left-to-right in rank order (identical to
  * `Bpe.segmentWord`, the driver-side reference the spec parity law pins).
  *
  * The merge list rides task serialization once as two parallel `String[]`
  * reference objects (the [[LongSetContains]] pattern) — never as a plan
  * literal — so tokenizing a corpus is a pure codegen'd projection whose
  * per-row cost is O(merges × word length). Rank-order sequential
  * application equals min-rank-first merging for any TRAINED list: a merge
  * whose side mentions symbol "lr" can only have been counted after "lr"
  * existed, i.e. after rank(l,r) — so later merges never create earlier
  * pairs.
  */
case class BpeSegment(child: Expression, lefts: Array[String], rights: Array[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if lefts.length == rights.length => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"merge arrays disagree: ${lefts.length} vs ${rights.length}")
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_segment expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_segment"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      BpeSegment.compute(input.asInstanceOf[UTF8String], lefts, rights))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("lefts", lefts, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("rights", rights, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.BpeSegment.compute($c, $lRef, $rRef));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeSegment {

  /** One string per Unicode CODE POINT — not per UTF-16 char: a `split("")`
    * segmentation would cut an astral character (emoji, CJK extensions)
    * into two lone surrogates, diverging from a SQL engine's per-code-point
    * `word[i:i]` indexing and producing invalid strings. Shared by the
    * kernel and the driver-side `Bpe.segmentWord` so both segment
    * identically.
    */
  def codePoints(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out += word.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Kernel (public static for generated code): code-point segmentation,
    * then one greedy left-to-right pass per merge in rank order.
    */
  def compute(word: UTF8String, lefts: Array[String], rights: Array[String]): Array[UTF8String] = {
    var seg: Array[String] = codePoints(word.toString)
    var k = 0
    while (k < lefts.length && seg.length > 1) {
      val l = lefts(k)
      val r = rights(k)
      var i = 0
      var changed = false
      // scan once to skip the rebuild when the pair is absent (the common
      // case: most merges touch few words)
      while (i + 1 < seg.length && !changed) {
        if (seg(i) == l && seg(i + 1) == r) changed = true else i += 1
      }
      if (changed) {
        val out = new scala.collection.mutable.ArrayBuffer[String](seg.length)
        var j = 0
        while (j < seg.length) {
          if (j + 1 < seg.length && seg(j) == l && seg(j + 1) == r) {
            out += (l + r); j += 2
          } else {
            out += seg(j); j += 1
          }
        }
        seg = out.toArray
      }
      k += 1
    }
    seg.map(UTF8String.fromString)
  }
}
