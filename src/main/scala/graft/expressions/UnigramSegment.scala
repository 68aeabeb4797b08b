package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) Viterbi segmentation of one word under
  * a trained piece table — the serving side of
  * [[graft.scale.Unigram.unigramVocab]]: minimize total integer bit cost
  * over all tilings of the word by vocabulary pieces, ties to fewer pieces,
  * then to the longest piece at each boundary (smallest split point). The
  * tie chain is a total order, so segmentation is value-exact on any engine
  * — the same DP the driver-side `Unigram.viterbi` runs during EM and the
  * DuckDB oracle replays as unrolled per-position rounds.
  *
  * The piece table rides task serialization once as reference objects (the
  * [[BpeSegment]] pattern) — never a plan literal — so corpus tokenization
  * is a codegen'd projection; per-row cost is O(word length × max piece
  * length) hash lookups. Returns NULL (not a partial tiling) for a word the
  * vocabulary cannot tile or one longer than `maxWordLen` code points —
  * the caller maps NULL to its UNK policy.
  */
case class UnigramSegment(child: Expression, pieces: Array[String], costs: Array[Long],
                          maxPieceLen: Int, maxWordLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if pieces.length == costs.length => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"piece arrays disagree: ${pieces.length} vs ${costs.length}")
    case t => TypeCheckResult.TypeCheckFailure(s"unigram_segment expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "unigram_segment"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] =
    UnigramSegment.buildTable(pieces, costs)

  override protected def nullSafeEval(input: Any): Any = {
    val seg = UnigramSegment.compute(
      input.asInstanceOf[UTF8String], table, maxPieceLen, maxWordLen)
    if (seg == null) null else new GenericArrayData(seg)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("table", table, "java.util.HashMap")
    val seg = ctx.freshName("useg")
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String[] $seg =
         |  graft.expressions.UnigramSegment.compute($c, $tRef, $maxPieceLen, $maxWordLen);
         |if ($seg == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($seg);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramSegment {

  /** Values are BOXED longs: a `HashMap[String, Long]` would auto-unbox a
    * missing key's null to 0 — a free piece — instead of "absent".
    */
  def buildTable(pieces: Array[String], costs: Array[Long]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), java.lang.Long.valueOf(costs(i))); i += 1 }
    m
  }

  /** Kernel (public static for generated code). Viterbi over code points:
    * dp(i) = lexicographic min over split points j of
    * (dp(j).cost + cost(word[j..i)), dp(j).pieces + 1, j) — smallest j on
    * a full tie, i.e. the longest final piece. Returns null when position
    * n is unreachable or the word exceeds `maxWordLen` code points.
    */
  def compute(word: UTF8String, table: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int, maxWordLen: Int): Array[UTF8String] = {
    val cps = BpeSegment.codePoints(word.toString)
    val n = cps.length
    if (n == 0 || n > maxWordLen) return null
    val INF = java.lang.Long.MAX_VALUE
    val c = new Array[Long](n + 1)
    val np = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    java.util.Arrays.fill(c, INF)
    c(0) = 0; np(0) = 0; bp(0) = -1
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      // j ascends, so on a full (cost, pieces) tie the FIRST winner — the
      // smallest j, the longest piece — is kept: replace only on strict
      // lexicographic improvement.
      while (j < i) {
        if (c(j) != INF) {
          val sb = new java.lang.StringBuilder
          var k = j
          while (k < i) { sb.append(cps(k)); k += 1 }
          val cost = table.get(sb.toString)
          if (cost != null) {
            val nc = c(j) + cost.longValue()
            val nn = np(j) + 1
            if (c(i) == INF || nc < c(i) || (nc == c(i) && nn < np(i))) {
              c(i) = nc; np(i) = nn; bp(i) = j
            }
          }
        }
        j += 1
      }
      i += 1
    }
    if (c(n) == INF) return null
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](np(n).toInt)
    var pos = n
    while (pos > 0) {
      val j = bp(pos)
      val sb = new java.lang.StringBuilder
      var k = j
      while (k < pos) { sb.append(cps(k)); k += 1 }
      out += UTF8String.fromString(sb.toString)
      pos = j
    }
    out.reverseIterator.toArray
  }
}
