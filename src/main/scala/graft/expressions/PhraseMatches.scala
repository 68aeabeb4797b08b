package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Every blocklist phrase occurring in `text` as a consecutive
  * whitespace-token run, DISTINCT and sorted — the C4/RefinedWeb "bad
  * words list" primitive (Raffel et al. 2020 filter docs on a public
  * phrase list). One Aho–Corasick pass (Aho & Corasick, CACM 1975) over
  * the token stream instead of one regex scan PER phrase: matching cost
  * is O(tokens) regardless of blocklist size, which is the difference
  * between feasible and not at a 400-phrase list × 100 TB. Token-level,
  * exact-token match (normalize case upstream if needed); overlapping
  * phrases all report (failure links, the point of the automaton).
  *
  * The automaton is built once on the driver from the literal phrase
  * list and ships to codegen as a reference object — the generated code
  * is a single virtual call per row, inside whole-stage codegen.
  */
case class PhraseMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"phrase_matches expects string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "phrase_matches"

  @transient private lazy val automaton = new PhraseAutomaton(phrases.toArray)

  override protected def nullSafeEval(input: Any): Any =
    automaton.run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aut = ctx.addReferenceObj("phraseAutomaton", automaton,
      classOf[PhraseAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $aut.run($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Token-level Aho–Corasick automaton over a fixed phrase list. Tokens
  * outside every phrase's vocabulary reset matching to the root in O(1)
  * (no transition can consume them), so the hot path is an array walk.
  * Node count is Σ phrase lengths + 1 — blocklists are metadata-sized,
  * the corpus never touches the build.
  */
final class PhraseAutomaton(val phrases: Array[String]) extends Serializable {

  private val tokSeqs: Array[Array[String]] =
    phrases.map(p => Ws.Pattern.split(p).filter(_.nonEmpty))
  require(tokSeqs.forall(_.nonEmpty), "empty phrase in blocklist")

  // token -> dense id over the union of phrase vocabularies
  private val vocab = new java.util.HashMap[String, Integer]()
  tokSeqs.foreach(_.foreach { t =>
    if (!vocab.containsKey(t)) vocab.put(t, vocab.size)
  })

  // trie: per-node goto map over token ids, failure link, emitted phrases
  private val gotoMaps =
    scala.collection.mutable.ArrayBuffer(new java.util.HashMap[Integer, Integer]())
  private val fail = scala.collection.mutable.ArrayBuffer(0)
  private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])

  tokSeqs.zipWithIndex.foreach { case (seq, pi) =>
    var s = 0
    seq.foreach { t =>
      val id = vocab.get(t)
      val nxt = gotoMaps(s).get(id)
      s = if (nxt != null) nxt.intValue()
      else {
        gotoMaps += new java.util.HashMap[Integer, Integer]()
        fail += 0
        out += Nil
        gotoMaps(s).put(id, gotoMaps.size - 1)
        gotoMaps.size - 1
      }
    }
    out(s) = pi :: out(s)
  }

  // BFS failure links (root's children fail to root)
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach { (_, v) => queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      gotoMaps(u).forEach { (tok, v) =>
        queue.add(v)
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).containsKey(tok)) f = fail(f)
        val g = gotoMaps(f).get(tok)
        fail(v) = if (g != null && g.intValue() != v.intValue()) g.intValue() else 0
        out(v) = out(v) ++ out(fail(v))
      }
    }
  }

  // frozen arrays for the hot path
  private val gotoArr: Array[java.util.HashMap[Integer, Integer]] = gotoMaps.toArray
  private val failArr: Array[Int] = fail.toArray
  private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray

  /** Distinct matched phrases, sorted; public for generated code. */
  def run(text: UTF8String): GenericArrayData = {
    val toks = Ws.Pattern.split(text.toString)
    val hits = new java.util.TreeSet[String]()
    var s = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        val id = vocab.get(t)
        if (id == null) s = 0
        else {
          while (s != 0 && !gotoArr(s).containsKey(id)) s = failArr(s)
          val g = gotoArr(s).get(id)
          s = if (g != null) g.intValue() else 0
          val o = outArr(s)
          var j = 0
          while (j < o.length) { hits.add(phrases(o(j))); j += 1 }
        }
      }
      i += 1
    }
    val arr = new Array[Any](hits.size)
    val it = hits.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
}
