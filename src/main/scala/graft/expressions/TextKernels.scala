package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text kernels for the hottest document scans (q22/q24:
  * the two slowest linear queries in BENCH_r02 at 4.3s each). The composable
  * column forms in graft.scale.Text remain the semantic reference — specs
  * assert these kernels agree with them on the corpus — but each kernel does
  * its whole job in one static call over the UTF-8 bytes instead of 25
  * separate `contains` probes / 4 regexp_replace passes / repeated `split`s.
  *
  * Byte-level notes (all three kernels):
  *  - a UTF-8 continuation byte is (b & 0xC0) == 0x80, so character counts
  *    are non-continuation byte counts and an ASCII byte can never be part
  *    of a multi-byte character — byte search == character search;
  *  - case folding is byte-wise ASCII ('A'..'Z' += 32); unlike lower()'s
  *    full Unicode fold this leaves non-ASCII uppercase letters alone,
  *    which is identical on ASCII text and irrelevant to the language
  *    markers (lowercase ASCII and Chinese, which has no case).
  */
object TextKernels {

  // ---- language-ID ---------------------------------------------------------

  /** Lang labels sorted ascending; ties pick the LAST (greatest) label to
    * match the composable form's array_max over struct(score, lang).
    */
  val langs: Array[String] = graft.scale.Text.langProfiles.keys.toArray.sorted

  private val markers: Array[Array[Array[Byte]]] =
    langs.map(l => graft.scale.Text.langProfiles(l)
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray)

  private val langsUtf8: Array[UTF8String] = langs.map(UTF8String.fromString)
  private val und = UTF8String.fromString("und")

  private def indexOf(hay: Array[Byte], hayLen: Int, needle: Array[Byte]): Boolean = {
    val n = needle.length
    val last = hayLen - n
    var i = 0
    while (i <= last) {
      var j = 0
      while (j < n && hay(i + j) == needle(j)) j += 1
      if (j == n) return true
      i += 1
    }
    false
  }

  /** Lowercased, space-padded copy of the text bytes (the " text " framing
    * the word-boundary markers rely on).
    */
  private def paddedLower(text: UTF8String): Array[Byte] = {
    val src = text.getBytes
    val out = new Array[Byte](src.length + 2)
    out(0) = ' '
    var i = 0
    while (i < src.length) {
      val b = src(i)
      out(i + 1) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    out(src.length + 1) = ' '
    out
  }

  /** Kernel for [[LangIdNative]] (public static for generated code). */
  def langId(text: UTF8String): UTF8String = {
    val hay = paddedLower(text)
    var best = 0
    var bestLang: UTF8String = und
    var l = 0
    while (l < markers.length) {
      val ms = markers(l)
      var score = 0
      var m = 0
      while (m < ms.length) {
        if (indexOf(hay, hay.length, ms(m))) score += 1
        m += 1
      }
      // >= so the greatest label wins ties, like array_max(struct(score, lang))
      if (score > 0 && score >= best) { best = score; bestLang = langsUtf8(l) }
      l += 1
    }
    bestLang
  }

  // ---- quality score -------------------------------------------------------

  /** Kernel for [[QualityScoreNative]]: one byte pass counting characters,
    * ASCII punctuation ([\p{Punct}] without UNICODE_CHARACTER_CLASS is
    * ASCII-only), digits, and uppercase — then the same weighted sum and
    * HALF_UP rounding as Text.qualityScore.
    */
  def qualityScore(text: UTF8String): Double = {
    val src = text.getBytes
    var nChars = 0L
    var nPunct = 0L
    var nDigit = 0L
    var nUpper = 0L
    var i = 0
    while (i < src.length) {
      val b = src(i)
      if ((b & 0xC0) != 0x80) nChars += 1
      if ((b >= 33 && b <= 47) || (b >= 58 && b <= 64) ||
          (b >= 91 && b <= 96) || (b >= 123 && b <= 126)) nPunct += 1
      else if (b >= '0' && b <= '9') nDigit += 1
      else if (b >= 'A' && b <= 'Z') nUpper += 1
      i += 1
    }
    val d = math.max(nChars, 1L).toDouble
    val lengthOk = math.min(nChars / 200d, 1d)
    val raw = lengthOk * 0.25 + (1d - nPunct / d) * 0.25 +
      (1d - nUpper / d) * 0.25 + (1d - nDigit / d) * 0.25
    java.math.BigDecimal.valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  // ---- token stats (q22) ---------------------------------------------------

  private val stopA = "a".getBytes
  private val stopThe = "the".getBytes
  private val stopOf = "of".getBytes

  private def tokenEquals(src: Array[Byte], from: Int, to: Int, w: Array[Byte]): Boolean = {
    if (to - from != w.length) return false
    var i = 0
    while (i < w.length) {
      if (src(from + i) != w(i)) return false
      i += 1
    }
    true
  }

  /** Kernel for [[TokenStats]]: single-space tokenization (split(text, ' ')
    * with trailing empties kept, matching Spark/DuckDB split), char count,
    * and {a, the, of} stopword hits — one pass, one output row.
    */
  def tokenStats(text: UTF8String): InternalRow = {
    val src = text.getBytes
    var nChars = 0L
    var nTokens = 1
    var nStop = 0L
    var tokStart = 0
    var i = 0
    while (i < src.length) {
      val b = src(i)
      if ((b & 0xC0) != 0x80) nChars += 1
      if (b == ' ') {
        if (tokenEquals(src, tokStart, i, stopA) || tokenEquals(src, tokStart, i, stopThe) ||
            tokenEquals(src, tokStart, i, stopOf)) nStop += 1
        nTokens += 1
        tokStart = i + 1
      }
      i += 1
    }
    if (tokenEquals(src, tokStart, src.length, stopA) ||
        tokenEquals(src, tokStart, src.length, stopThe) ||
        tokenEquals(src, tokStart, src.length, stopOf)) nStop += 1
    val n = nTokens.toDouble
    new GenericInternalRow(Array[Any](
      nTokens, (nChars - nTokens + 1) / n, nStop / n))
  }

  val tokenStatsType: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("avg_token_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false)))
}

/** Language-ID over the engine's marker profiles in one static call —
  * replaces 25 separate Contains probes over a repeated lower+concat
  * (see graft.scale.Text.langIdFrom, the semantic reference form).
  */
case class LangIdNative(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lang_id expects string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.langId(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.langId($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Composite quality score in one byte pass — replaces four regexp_replace
  * scans (see graft.scale.Text.qualityScore, the semantic reference form).
  */
case class QualityScoreNative(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"quality_score expects string, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.qualityScore(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.qualityScore($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** q22's three token statistics in one pass over the bytes — replaces four
  * independent split()s of the same text.
  */
case class TokenStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_stats expects string, got $t")
  }
  override def dataType: DataType = TextKernels.tokenStatsType
  override def prettyName: String = "token_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.tokenStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.TextKernels.tokenStats($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
