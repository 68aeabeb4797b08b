package graft.expressions

import graft.SparkSpec
import graft.scale.Curation
import org.apache.spark.sql.functions._

/** Aho–Corasick phrase-matching laws: overlap via failure links, token
  * resets, distinct sorted output, null/empty behavior.
  */
class PhraseMatchesSpec extends SparkSpec {
  import spark.implicits._

  private def matches(text: String, phrases: Seq[String]): Seq[String] =
    spark.range(1).select(Curation.phraseMatches(lit(text), phrases).as("m"))
      .as[Seq[String]].head()

  test("overlapping phrases both report — the failure-link law") {
    // after consuming "alpha beta" the automaton must continue matching
    // "beta gamma" from its failure state, not restart at the root
    assert(matches("alpha beta gamma", Seq("alpha beta", "beta gamma")) ===
      Seq("alpha beta", "beta gamma"))
    // a phrase that is a suffix of another also reports
    assert(matches("one two three", Seq("one two three", "two three", "three")) ===
      Seq("one two three", "three", "two three"))
  }

  test("matches are consecutive-token runs: gaps and partial tokens never match") {
    assert(matches("fast x merge", Seq("fast merge")) === Seq.empty)
    assert(matches("fastmerge", Seq("fast merge")) === Seq.empty)
    assert(matches("superfast merge", Seq("fast merge")) === Seq.empty)
    assert(matches("fast merge", Seq("fast merge")) === Seq("fast merge"))
  }

  test("repeated-token phrase, duplicates collapse, output sorted") {
    // "window window window" contains two (overlapping) occurrences; the
    // distinct set has one entry
    assert(matches("window window window", Seq("window window")) ===
      Seq("window window"))
    assert(matches("b a b a", Seq("b a", "a b")) === Seq("a b", "b a"))
  }

  test("empty text yields empty array; null text yields null") {
    assert(matches("", Seq("x y")) === Seq.empty)
    val r = spark.sql("SELECT CAST(NULL AS STRING) AS t")
      .select(Curation.phraseMatches(col("t"), Seq("x")).as("m"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("matching cost path: unknown tokens reset to root without breaking later matches") {
    assert(matches("zzz yyy slow filter qqq", Seq("slow filter")) ===
      Seq("slow filter"))
  }
}
