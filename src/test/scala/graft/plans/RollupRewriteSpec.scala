package graft.plans

import graft.SparkSpec
import graft.core.{Scratch, Tables}
import graft.summary.Rollup
import graft.summary.Rollup.RollupSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the materialized-rollup rewrite: a registered MV answers every
  * coarser sum/count/min/max aggregate (proven by scan paths — the base is
  * never read), answers are bit-identical to the un-rewritten plan, every
  * unsound shape is declined, and incremental maintenance is exact and
  * schema-stable.
  */
class RollupRewriteSpec extends SparkSpec {

  private val spec = RollupSpec(
    keys = Seq("o_orderdate", "o_orderstatus"), measures = Seq("o_totalprice"))

  private def orders = Tables.orders(spark, sfDir)
  private def basePath = Tables.path(sfDir, "orders")
  private def baseNorm = MvCatalog.normalize(basePath)

  private def withMv[A](body: => A): A = {
    val mvPath = Scratch.dir("graft-mv-spec") + "/orders_mv"
    Rollup.materialize(spark, orders, basePath, mvPath, spec)
    try body finally MvCatalog.unregister(basePath)
  }

  // revenue rounded: re-summing per-day partials reorders a double sum, so
  // last-ulp drift vs the direct plan is expected (same tolerance the DuckDB
  // oracle comparison uses); counts and min/max must be exact
  private def monthly: DataFrame = orders
    .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
    .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("rev"),
      min("o_totalprice").as("lo"), max("o_totalprice").as("hi"),
      count("o_totalprice").as("nn"))

  test("coarser aggregate reads the MV only, and answers match the base plan exactly") {
    withMv {
      val df = monthly
      val scans = Rollup.scanPaths(df)
      assert(scans.nonEmpty && !scans.contains(baseNorm), scans.toString)
      val rewritten = df.collect().toSet
      spark.conf.set("spark.graft.rewriteRollup", "false")
      val direct =
        try {
          val d = monthly
          assert(Rollup.scanPaths(d).contains(baseNorm), "disable knob is dead")
          d.collect().toSet
        } finally spark.conf.unset("spark.graft.rewriteRollup")
      assert(rewritten === direct)
    }
  }

  test("filter on a key column stays rewritable; min/max over a key column rewrite too") {
    withMv {
      val df = orders.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderstatus"))
        .agg(max("o_orderdate").as("last_day"), min("o_orderdate").as("first_day"),
          count(lit(1)).as("cnt"))
      assert(!Rollup.scanPaths(df).contains(baseNorm))
      val expected = orders.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderstatus"))
        .agg(max("o_orderdate"), min("o_orderdate"), count(lit(1)))
        .collect().toSet
      assert(df.collect().toSet === expected.map(identity))
    }
  }

  test("unsound shapes are declined: distinct agg, non-key filter, unregistered measure, avg") {
    withMv {
      val distinctAgg = orders.groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("u"))
      assert(Rollup.scanPaths(distinctAgg).contains(baseNorm))

      val nonKeyFilter = orders.filter(col("o_custkey") > 10)
        .groupBy("o_orderstatus").agg(sum("o_totalprice").as("rev"))
      assert(Rollup.scanPaths(nonKeyFilter).contains(baseNorm))

      val unregistered = orders.groupBy("o_orderstatus")
        .agg(sum("o_custkey").as("s"))
      assert(Rollup.scanPaths(unregistered).contains(baseNorm))

      val average = orders.groupBy("o_orderstatus")
        .agg(avg("o_totalprice").as("a"))
      assert(Rollup.scanPaths(average).contains(baseNorm))

      // derived column between scan and aggregate disqualifies
      val derived = orders
        .withColumn("double_price", col("o_totalprice") * 2)
        .groupBy("o_orderstatus").agg(sum("double_price").as("s"))
      assert(Rollup.scanPaths(derived).contains(baseNorm))
    }
  }

  test("global count over an empty base rewrites to 0, not NULL") {
    val root = Scratch.dir("graft-mv-empty")
    val emptyBase = orders.filter(lit(false))
    emptyBase.write.parquet(s"$root/base")
    val base = spark.read.parquet(s"$root/base")
    Rollup.materialize(spark, base, s"$root/base", s"$root/mv", spec)
    try {
      val df = base.agg(count(lit(1)).as("cnt"), sum("o_totalprice").as("rev"))
      assert(!Rollup.scanPaths(df).contains(MvCatalog.normalize(s"$root/base")))
      val row = df.collect().head
      assert(row.getLong(0) === 0L)
      assert(row.isNullAt(1))
    } finally MvCatalog.unregister(s"$root/base")
  }

  test("incremental maintenance is exact and schema-stable across rounds") {
    val d1 = orders.filter(col("o_orderdate") < lit("1995-01-01"))
    val d2 = orders.filter(col("o_orderdate") >= lit("1995-01-01") &&
      col("o_orderdate") < lit("1997-01-01"))
    val d3 = orders.filter(col("o_orderdate") >= lit("1997-01-01"))
    val mv0 = Rollup.build(d1, spec)
    val mv1 = Rollup.maintain(mv0, d2, spec)
    val mv2 = Rollup.maintain(mv1, d3, spec)
    assert(mv2.schema === mv0.schema)
    val full = Rollup.build(orders, spec)
    val key = Seq("o_orderdate", "o_orderstatus")
    def canon(df: DataFrame) = df
      .withColumn("sum_o_totalprice", round(col("sum_o_totalprice"), 2))
      .collect().map(r => key.map(r.getAs[Any]) -> r.toSeq).toMap
    assert(canon(mv2) === canon(full))
  }

  test("maintenance merge never re-scans anything but mv + delta") {
    val root = Scratch.dir("graft-ivm-spec")
    Rollup.build(orders.filter(col("o_orderdate") < lit("1995-01-01")), spec)
      .write.parquet(s"$root/mv0")
    orders.filter(col("o_orderdate") >= lit("1995-01-01"))
      .write.parquet(s"$root/delta")
    val maintained = Rollup.maintain(
      spark.read.parquet(s"$root/mv0"), spark.read.parquet(s"$root/delta"), spec)
    val scans = Rollup.scanPaths(maintained)
    assert(scans.toSet === Set(s"$root/mv0", s"$root/delta").map(MvCatalog.normalize))
  }

  test("joinDelta law: V0 + three-term delta == full join, and each term is needed") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    val a = (1 to 400).map(i => (i.toLong, rnd.nextInt(50).toLong)).toDF("aid", "k")
    val b = (1 to 120).map(i => (rnd.nextInt(60).toLong, s"v$i")).toDF("k", "payload")
    val aSplit = pmod(col("aid"), lit(3)) === 0
    val bSplit = pmod(length(col("payload")), lit(2)) === 0
    val (a0, da) = (a.filter(!aSplit), a.filter(aSplit))
    val (b0, db) = (b.filter(!bSplit), b.filter(bSplit))
    val v0 = a0.join(b0, Seq("k"))
    val maintained = v0.unionByName(
      graft.summary.Rollup.joinDelta(a0, da, b0, db, Seq("k")))
    val full = a.join(b, Seq("k"))
    assert(maintained.count() === full.count())
    assert(maintained.exceptAll(full).count() === 0 &&
      full.exceptAll(maintained).count() === 0)
    // dropping the delta-delta term loses rows (it is not redundant)
    val twoTerm = v0.unionByName(da.join(b0, Seq("k")))
      .unionByName(a0.join(db, Seq("k")))
    assert(twoTerm.count() < full.count())
  }
}
