package graft.expressions

/** The engine's single whitespace definition: `[ \t\n\f\r]` — the RE2 `\s`
  * set. Java regex `\s` additionally matches vertical tab 0x0B, so an engine
  * tokenizing with Java `\s` disagrees with an RE2-based engine (DuckDB,
  * Go/Rust regex) on any text containing `\v` — a data-dependent divergence.
  * Every tokenizer in graft (Column-level splits, native kernels) routes
  * through this object so the word boundary is one fact, not five copies.
  */
object Ws {

  /** Character-class form for regex engines (Spark `split`/`regexp_replace`,
    * Java `Pattern`, RE2). One-or-more so it splits on runs.
    */
  val Regex: String = "[ \\t\\n\\f\\r]+"

  /** Pre-compiled pattern for driver/kernel-side `String` splitting. */
  val Pattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(Regex)

  /** Byte-level predicate for single-pass UTF-8 kernels. All five whitespace
    * bytes are ASCII, so a byte test is exact on UTF-8 input (continuation
    * bytes have the high bit set and can never equal these).
    */
  def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  // ---- unicode-script segmentation fallback (r17 verdict item 3) ----
  //
  // CJK/Thai text has no spaces between words, so a whitespace-only word
  // model degrades to line-granularity "words" on the zh/ja/th slices of a
  // multilingual corpus. The regex-expressible fallback: each Han/Kana
  // codepoint becomes its own token (the character-unigram convention CJK
  // IR/tokenizer-training pipelines use when no segmenter is available),
  // and each Thai RUN becomes one token (Thai codepoints carry combining
  // vowels — char-splitting would shear them). Both rules are plain regex
  // replaces, hence DuckDB-replayable; on ASCII text both are the
  // identity, which is what keeps every existing oracle bit-unchanged.
  //
  // The Java (Spark) and RE2 (DuckDB) character classes are generated from
  // ONE range list so the two engines cannot drift. BMP-only by design:
  // Java char classes operate on UTF-16 code units, so astral ranges would
  // need surrogate-pair alternations — outside the fallback's scope.

  /** Scripts tokenized one CODEPOINT per token: Han (unified + ext-A +
    * compat) and Kana (hiragana, katakana + phonetic extensions).
    */
  private val CharRanges: Seq[(Int, Int)] = Seq(
    (0x3040, 0x309F), // hiragana
    (0x30A0, 0x30FF), // katakana
    (0x31F0, 0x31FF), // katakana phonetic extensions
    (0x3400, 0x4DBF), // CJK ext A
    (0x4E00, 0x9FFF), // CJK unified
    (0xF900, 0xFAFF)) // CJK compatibility ideographs

  /** Scripts tokenized one RUN per token: Thai. */
  private val RunRanges: Seq[(Int, Int)] = Seq((0x0E00, 0x0E7F))

  private def cls(rs: Seq[(Int, Int)], fmt: Int => String): String =
    rs.map { case (a, b) => s"${fmt(a)}-${fmt(b)}" }.mkString("[", "", "]")
  private def javaCp(cp: Int): String = f"\\u$cp%04X"
  private def re2Cp(cp: Int): String = f"\\x{$cp%04X}"

  /** Script-aware pre-segmentation as a Column transform: a space around
    * every Han/Kana codepoint and around every Thai run; compose with
    * [[Regex]]-splitting (the extra spaces vanish in the run split).
    * Identity on ASCII. Idempotent.
    */
  def segment(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.regexp_replace
    regexp_replace(
      regexp_replace(c, s"(${cls(CharRanges, javaCp)})", " $1 "),
      s"(${cls(RunRanges, javaCp)}+)", " $1 ")
  }

  /** The same transform over a SQL expression, in DuckDB's RE2 syntax —
    * the oracle-side replay of [[segment]].
    */
  def segmentSql(e: String): String =
    s"regexp_replace(regexp_replace($e, '(${cls(CharRanges, re2Cp)})', ' \\1 ', 'g'), " +
      s"'(${cls(RunRanges, re2Cp)}+)', ' \\1 ', 'g')"
}
