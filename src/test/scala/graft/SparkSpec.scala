package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites. Small parallelism: test data is
  * tiny and scheduling 32 threads per suite just slows the build down.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** The smallest driver fixture set — enough rows to be meaningful,
    * fast enough for unit tests.
    */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // The window fence (r16 verdict item 7): every query ANY suite ran on
    // the shared session is audited for unpartitioned windows whose input
    // is neither Limit-bounded nor on the semantic allowlist — checked at
    // every suite boundary so the offending suite fails, not just the last.
    val bad = SparkSpec.windowGuard.violations
    assert(bad.isEmpty,
      s"unbounded single-partition window(s) executed — rank through " +
        s"TopK.rankedCut/denseRankBy or justify in " +
        s"SparkSpec.BoundedWindowOrders/Aliases: ${bad.mkString("; ")}\n" +
        SparkSpec.windowGuard.examples.values.mkString("\n----\n"))
    // session is shared across suites; never stop it here
    super.afterAll()
  }
}

object SparkSpec {

  /** Global windows whose single partition is SEMANTICALLY bounded (the
    * structurally Limit-bounded ones need no registration —
    * [[graft.plans.WindowAudit]] proves those from the plan). Keyed by the
    * ORDER BY signature; every entry cites its bound.
    */
  val BoundedWindowOrders: Set[String] = Set(
    // Curation.heapsCurve: cumulative sums over bit-length buckets — ~log N
    // rows by construction
    "b ASC NULLS FIRST",
    // Extended q178-family calendar frames: one row per day in the window
    "dayn ASC NULLS FIRST",
    // Test-fixture oracles (TemporalSpec interpolation spine,
    // SuffixArraySpec denseRank/denseRankBy parity) — tiny literal relations
    "day ASC NULLS FIRST",
    "w ASC NULLS FIRST",
    "cnt DESC NULLS LAST, w ASC NULLS FIRST",
    "k1 ASC NULLS FIRST, k2 ASC NULLS FIRST")

  /** Bounded sites whose ORDER columns are caller-chosen, recognized by
    * their window ALIASES instead: Skyline.frontierValues' bucket summary
    * (`__lower`, B bucket rows) and pruned staircase (`__run`, frontier
    * candidates after the bucket kill).
    */
  val BoundedWindowAliases: Set[String] = Set("__lower", "__run")

  private def windowAllowed(sig: String): Boolean = {
    val i = sig.indexOf(" OVER (")
    if (i < 0) false
    else {
      val aliases = sig.substring(0, i).split(",")
      val order = sig.substring(i + 7, sig.length - 1)
      BoundedWindowOrders(order) || aliases.forall(BoundedWindowAliases)
    }
  }

  lazy val windowGuard = new graft.plans.WindowGuard(windowAllowed)

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(graft.core.Tables.NanosConfKey, "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.listenerManager.register(windowGuard)
    s
  }
}
