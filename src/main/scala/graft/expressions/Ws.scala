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
}
