package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a document in one native pass: tokenize → word
  * n-gram shingles → distinct → per-shingle xxhash64 → k per-seed minima,
  * all inside a single static JVM helper invoked from generated code.
  *
  * Why: the composable form (transform/slice/array_join shingles exploded
  * into a partial-aggregated groupBy) pays interpreted higher-order-function
  * evaluation per shingle plus a |docs|·k-long shuffle. This expression is
  * one virtual call per document row — no intermediate Tungsten arrays, no
  * explode, no shuffle — and keeps the enclosing projection inside
  * whole-stage codegen (generated code calls the public static helper).
  *
  * Signature VALUES differ from the SQL-composed form (different hash
  * chaining); all MinHash guarantees (per-seed min over the same shingle
  * set) are preserved, which is what LSH banding consumes.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignature.compute(input.asInstanceOf[UTF8String], numHashes, shingleSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.MinHashSignature.compute($c, $numHashes, $shingleSize));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  /** Distinct word n-gram shingles of a document, insertion-ordered.
    * Token/shingle semantics mirror graft.scale.Text: whitespace split,
    * n-token windows joined by one space, short texts yield the whole text
    * as a single shingle.
    */
  def distinctShingles(text: UTF8String, shingleSize: Int): java.util.LinkedHashSet[String] = {
    val toks = Ws.Pattern.split(text.toString)
    val nTok = toks.length
    val lastStart = math.max(nTok - shingleSize, 0)
    val seen = new java.util.LinkedHashSet[String](math.max(16, nTok * 2))
    var i = 0
    while (i <= lastStart) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < shingleSize && i + j < nTok) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen
  }

  /** Tight-loop kernel, called from generated code (must stay public static). */
  def compute(text: UTF8String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val it = distinctShingles(text, shingleSize).iterator()
    while (it.hasNext) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(it.next()), 42L)
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashLong(h, k.toLong)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
    }
    mins
  }

  /** Kernel for [[DistinctShingles]] (public static for generated code). */
  def shingleArray(text: UTF8String, shingleSize: Int): Array[UTF8String] = {
    val set = distinctShingles(text, shingleSize)
    val out = new Array[UTF8String](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    out
  }
}

/** Distinct word n-gram shingles as a native expression — the companion to
  * [[MinHashSignature]] for the Jaccard verify step, replacing the
  * interpreted transform/slice/array_join pipeline with one static call.
  */
case class DistinctShingles(child: Expression, shingleSize: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"distinct_shingles expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "distinct_shingles"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSignature.shingleArray(input.asInstanceOf[UTF8String], shingleSize)
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.expressions.MinHashSignature.shingleArray($c, $shingleSize));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
