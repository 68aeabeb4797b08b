package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy longest-match-first segmentation of one word under a
  * trained vocabulary — the serving side of
  * [[graft.scale.Wordpiece.wordpieceMerges]] (Schuster & Nakajima 2012; the
  * BERT `WordpieceTokenizer` inference rule): at the word start take the
  * longest vocabulary piece that prefixes the word, then repeatedly take the
  * longest `##`-marked continuation piece matching at the current position.
  * Longest-match is tie-free (two equal-length matches at one position are
  * the same string), so segmentation is value-exact on any engine — the
  * DuckDB oracle replays it as unrolled per-step argmax rounds.
  *
  * Marker discipline (shared with the trainer and the oracle, total over
  * arbitrary corpora — including words that themselves contain `#`):
  * a vocabulary piece is an INITIAL candidate iff it does not start with
  * `##`, and a CONTINUATION candidate iff it starts with `##` and strips to
  * a nonempty remainder. A piece spelled exactly `##` (reachable when a
  * corpus word starts with `##`) is therefore unusable at serve time on
  * both engines rather than ambiguously zero-width.
  *
  * The vocabulary rides task serialization once as a reference object (the
  * [[BpeSegment]] pattern) — never a plan literal — so corpus tokenization
  * is a codegen'd projection; per-row cost is O(word length × max piece
  * length) hash probes. Returns NULL (never a partial tiling — WordPiece
  * fails the whole word) when no candidate matches at some position or the
  * word exceeds `maxWordLen` code points; the caller maps NULL to UNK.
  */
case class WordpieceSegment(child: Expression, pieces: Array[String], maxWordLen: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"wordpiece_segment expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "wordpiece_segment"

  @transient private lazy val vocab: java.util.HashSet[String] =
    WordpieceSegment.buildSet(pieces)

  /** Longest piece in CODE POINTS — bounds the per-position probe loop.
    * Computed once driver-side and baked into the generated code.
    */
  private lazy val maxPieceCps: Int =
    if (pieces.isEmpty) 0
    else pieces.iterator.map(p => p.codePointCount(0, p.length)).max

  override protected def nullSafeEval(input: Any): Any = {
    val seg = WordpieceSegment.compute(
      input.asInstanceOf[UTF8String], vocab, maxPieceCps, maxWordLen)
    if (seg == null) null else new GenericArrayData(seg)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vocab", vocab, "java.util.HashSet")
    val seg = ctx.freshName("wpseg")
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String[] $seg =
         |  graft.expressions.WordpieceSegment.compute($c, $vRef, $maxPieceCps, $maxWordLen);
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

object WordpieceSegment {

  def buildSet(pieces: Array[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { s.add(pieces(i)); i += 1 }
    s
  }

  /** Kernel (public static for generated code). Greedy longest-match over
    * code points: at each position try spans of descending code-point
    * length; position 0 looks the raw span up as an initial piece (rejecting
    * spans that spell the marker), later positions look `## + span` up. Any
    * position with no match fails the WHOLE word (null), never a partial
    * tiling.
    */
  def compute(word: UTF8String, vocab: java.util.HashSet[String],
              maxPieceCps: Int, maxWordLen: Int): Array[UTF8String] = {
    val cps = BpeSegment.codePoints(word.toString)
    val n = cps.length
    if (n == 0 || n > maxWordLen || maxPieceCps == 0) return null
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var pos = 0
    while (pos < n) {
      var l = math.min(n - pos, maxPieceCps)
      var matched: String = null
      while (l >= 1 && matched == null) {
        val sb = new java.lang.StringBuilder
        var k = pos
        while (k < pos + l) { sb.append(cps(k)); k += 1 }
        val sub = sb.toString
        if (pos == 0) {
          if (!sub.startsWith("##") && vocab.contains(sub)) matched = sub
        } else {
          val key = "##" + sub
          if (vocab.contains(key)) matched = key
        }
        if (matched == null) l -= 1
      }
      if (matched == null) return null
      out += UTF8String.fromString(matched)
      pos += l
    }
    out.toArray
  }
}
