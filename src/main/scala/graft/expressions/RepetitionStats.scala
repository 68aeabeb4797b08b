package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style repetition statistics of a document in one native pass:
  * word count, distinct-word count, the multiplicity of the most frequent
  * word, and the multiplicity of the most frequent adjacent word bigram.
  * These are the core "repetitious text" quality signals of the Gopher /
  * MassiveText filtering rules (duplicate-fraction and top-n-gram-fraction
  * thresholds), reduced to exact integer counts so downstream ratios are
  * reproducible on any engine.
  *
  * Why native: the composable form explodes every word AND every bigram of
  * every document through two groupBy shuffles; at 100 TB the exploded word
  * stream is ~20x the corpus size. This expression is one virtual call per
  * document row inside whole-stage codegen — the text never leaves the scan
  * task, nothing is exploded, and the enclosing per-lang aggregate ships 4
  * ints per doc.
  *
  * Semantics: words are maximal runs of non-whitespace bytes ([[Ws]] set —
  * RE2 `\s`); counting is over xxhash64-style 64-bit word hashes, so two words
  * collide only at ~2^-64 (the spec pins kernel == explode-based string
  * counting on real corpus samples).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"repetition_stats expects string, got $t")
  }
  override def dataType: DataType = RepetitionStats.outputType
  override def prettyName: String = "repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RepetitionStats.compute($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whitespace word count alone — for callers (sequence packing) that need
  * only n_words: a single counting loop, no hash tables, no bigram pass.
  * Token semantics identical to [[RepetitionStats]].
  */
case class WordCountNative(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_count"
  override protected def nullSafeEval(input: Any): Any =
    RepetitionStats.wordCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RepetitionStats.wordCount($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  val outputType: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_word", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))

  private def isSpace(b: Byte): Boolean = Ws.isSpace(b)

  // 64-bit FNV-1a over the word's bytes + an avalanche finish — collisions
  // are what break parity with string counting, so the tail mix matters.
  private def fmix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }

  /** Open-addressing count table over long keys; returns (distinct, maxCount).
    * Capacity is the next power of two >= 2n, so load factor <= 0.5.
    */
  private def countStats(keys: Array[Long], n: Int): (Int, Int) = {
    if (n == 0) return (0, 0)
    var cap = 16
    while (cap < n * 2) cap <<= 1
    val mask = cap - 1
    val slotKey = new Array[Long](cap)
    val slotCnt = new Array[Int](cap)
    var distinct = 0
    var maxCnt = 0
    var i = 0
    while (i < n) {
      val k = keys(i)
      var s = (fmix(k) & mask).toInt
      while (slotCnt(s) != 0 && slotKey(s) != k) s = (s + 1) & mask
      if (slotCnt(s) == 0) { slotKey(s) = k; distinct += 1 }
      slotCnt(s) += 1
      if (slotCnt(s) > maxCnt) maxCnt = slotCnt(s)
      i += 1
    }
    (distinct, maxCnt)
  }

  /** Counting-only kernel for [[WordCountNative]] (public static for
    * generated code): number of maximal non-whitespace runs.
    */
  def wordCount(text: UTF8String): Int = {
    val src = text.getBytes
    var n = 0
    var i = 0
    var inWord = false
    while (i < src.length) {
      val sp = isSpace(src(i))
      if (!sp && !inWord) n += 1
      inWord = !sp
      i += 1
    }
    n
  }

  /** Tight-loop kernel, called from generated code (must stay public static). */
  def compute(text: UTF8String): InternalRow = {
    val src = text.getBytes
    // pass 1: hash each maximal non-whitespace run (FNV-1a 64 + avalanche)
    var hashes = new Array[Long](16)
    var nWords = 0
    var i = 0
    while (i < src.length) {
      if (!isSpace(src(i))) {
        var h = 0xCBF29CE484222325L
        while (i < src.length && !isSpace(src(i))) {
          h = (h ^ (src(i) & 0xFFL)) * 0x100000001B3L
          i += 1
        }
        if (nWords == hashes.length) hashes = java.util.Arrays.copyOf(hashes, nWords * 2)
        hashes(nWords) = fmix(h)
        nWords += 1
      } else i += 1
    }
    val (nDistinct, topWord) = countStats(hashes, nWords)
    // pass 2: adjacent-bigram hashes, counted in a fresh table
    var topBigram = 0
    if (nWords >= 2) {
      val bi = new Array[Long](nWords - 1)
      var j = 0
      while (j < nWords - 1) {
        bi(j) = fmix(hashes(j) * 0x9E3779B97F4A7C15L ^ hashes(j + 1))
        j += 1
      }
      topBigram = countStats(bi, nWords - 1)._2
    }
    new GenericInternalRow(Array[Any](nWords, nDistinct, topWord, topBigram))
  }
}
