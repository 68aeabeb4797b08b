package graft.scale

import graft.SparkSpec
import graft.scale.Profiler.ProfileSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Laws for the one-pass profiler: a single scan feeds every metric, planted
  * defects surface in the right metric, and the approx-distinct variant
  * keeps the same shape with bounded state.
  */
class ProfilerSpec extends SparkSpec {

  import spark.implicits._

  private val dirty = Seq(
    (1L, Some("aaaa"), Some("en"), 10L),
    (2L, None, Some("en"), 20L),
    (3L, Some("bb"), Some("EN"), 30L),
    (3L, Some("cc"), None, 40L) // duplicate key
  ).toDF("id", "text", "lang", "n")

  private val spec = ProfileSpec(
    numericCols = Seq("id", "n"), stringCols = Seq("text", "lang"),
    distinctCols = Seq("id", "lang"), patterns = Map("lang" -> "^[a-z]{2}$"),
    uniqueKeys = Seq("id"), requiredCols = Seq("text"))

  private def metrics(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap

  test("planted defects surface: nulls, dup keys, pattern violations") {
    val m = metrics(Profiler.profile(dirty, spec))
    assert(m(("*", "row_count")) === 4.0)
    assert(m(("text", "null_frac")) === 0.25)
    assert(m(("lang", "null_frac")) === 0.25)
    assert(m(("id", "distinct_count")) === 3.0)
    assert(m(("id", "check_unique")) === 0.0)
    assert(m(("text", "check_complete")) === 0.0)
    // 2 of 4 match ^[a-z]{2}$ ("EN" and NULL do not)
    assert(m(("lang", "pattern_frac")) === 0.5)
    assert(m(("n", "min")) === 10.0)
    assert(m(("n", "max")) === 40.0)
    assert(m(("n", "mean")) === 25.0)
    assert(math.abs(m(("text", "avg_bytes")) - (4 + 2 + 2) / 3.0) < 1e-3)
  }

  test("the whole profile is one scan of the input") {
    val prof = Profiler.profile(dirty, spec)
    prof.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case _: FileSourceScanExec => 1
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case other => other.children.map(scans).sum
    }
    // local Dataset has no file scan; use the parquet-backed documents table
    val fileProf = Profiler.profile(
      graft.core.Tables.documents(spark, sfDir),
      ProfileSpec(numericCols = Seq("n_chars"), stringCols = Seq("text", "lang"),
        distinctCols = Seq("lang"), uniqueKeys = Nil, requiredCols = Seq("text")))
    fileProf.collect()
    assert(scans(fileProf.queryExecution.executedPlan) === 1,
      fileProf.queryExecution.executedPlan.toString)
  }

  test("approxDistinct keeps shape and lands near the exact count") {
    val big = (0 until 20000).map(i => (s"k$i", "x")).toDF("id", "text")
    val m = metrics(Profiler.profile(big,
      ProfileSpec(stringCols = Seq("id"), distinctCols = Seq("id"),
        approxDistinct = true)))
    val d = m(("id", "distinct_count"))
    assert(math.abs(d - 20000) / 20000.0 < 0.05, s"approx=$d")
  }

  test("PMI bits: planted association positive, anti-association negative") {
    import spark.implicits._
    // x=a occurs ONLY with y=p (perfect association); x=b spreads evenly
    val rows = Seq.fill(500)(("a", "p")) ++
      (1 to 500).map(i => ("b", if (i % 2 == 0) "p" else "q"))
    val docs = rows.toDF("lang", "source")
    val n = docs.count()
    val cells = docs.groupBy("lang", "source").agg(count(lit(1)).as("n_xy"))
      .join(docs.groupBy("lang").agg(count(lit(1)).as("n_x")), "lang")
      .join(docs.groupBy("source").agg(count(lit(1)).as("n_y")), "source")
      .select(col("lang"), col("source"),
        (length(bin(col("n_xy") * lit(n))).cast("long") -
          length(bin(col("n_x") * col("n_y"))).cast("long")).as("pmi_bits"))
      .as[(String, String, Long)].collect()
      .map { case (x, y, b) => (x, y) -> b }.toMap
    // bitlen PMI is floor-log2-coarse (+-1 bit): (b,q) has true PMI
    // log2(0.5/0.25) = +1 exactly; (b,p) log2(0.5/0.75) < 0; (a,p)
    // log2(1/0.75) = +0.4 floors to >= 0; (a,q) never occurs (no row)
    assert(cells(("b", "q")) >= 1, cells)
    assert(cells(("b", "p")) <= -1, cells)
    assert(cells(("a", "p")) >= 0, cells)
    assert(!cells.contains(("a", "q")))
  }
}
