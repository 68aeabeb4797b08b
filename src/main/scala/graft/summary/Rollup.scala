package graft.summary

import graft.core.{Q, Scratch, Tables}
import graft.plans.{MvCatalog, MvMeasures}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Materialized rollups: build, register for [[graft.plans.RollupRewrite]],
  * and maintain incrementally under append-only ingest (the W3 write pattern,
  * reference `dags/MySQL_to_Redshift.py`-style daily loads).
  *
  * The MV stores per-group PARTIAL aggregates (sum/cnt/min/max per measure,
  * plus a row count), so any coarser aggregate — coarser grouping, filters on
  * keys, expressions over keys — is answerable by re-aggregating the MV,
  * which the optimizer rule does transparently. Incremental maintenance is
  * the same rollup applied to `old MV ∪ rollup(delta)`: cost O(|mv|+|delta|),
  * never a base re-scan — the property that makes golden summary tables
  * sustainable at 100 TB (the reference rebuilds its summaries from the full
  * base every run, config/mau_summary.py:4-28; at warehouse scale that
  * rebuild IS the cost, and this module replaces it).
  */
object Rollup {

  /** Declarative rollup shape: grouping keys kept at full granularity plus
    * the measure columns to carry sum/cnt/min/max partials for.
    */
  final case class RollupSpec(keys: Seq[String], measures: Seq[String]) {
    def mvMeasures: MvMeasures = MvMeasures(
      sums = measures.map(c => c -> s"sum_$c").toMap,
      cnts = measures.map(c => c -> s"cnt_$c").toMap,
      mins = measures.map(c => c -> s"min_$c").toMap,
      maxs = measures.map(c => c -> s"max_$c").toMap,
      rowCount = Some("cnt_rows"))
  }

  /** One-pass rollup of `base` (or of a delta batch) into MV shape. */
  def build(base: DataFrame, spec: RollupSpec): DataFrame = {
    val aggs = spec.measures.flatMap(c => Seq(
      sum(c).as(s"sum_$c"), count(c).as(s"cnt_$c"),
      min(c).as(s"min_$c"), max(c).as(s"max_$c"))) :+
      count(lit(1)).as("cnt_rows")
    base.groupBy(spec.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a delta rollup into an existing MV: union + re-rollup of the
    * partials, cast back to the MV's column types so the schema is a fixed
    * point across maintenance rounds (decimal sums would otherwise widen
    * every round). Sum/min/max partials merge by their own combine; counts
    * merge by sum. Append-only contract: deletes/updates in the base are NOT
    * representable (min/max partials are not subtractable) — same contract
    * as the W3 append writers feeding it.
    */
  def maintain(mv: DataFrame, delta: DataFrame, spec: RollupSpec): DataFrame = {
    val d = build(delta, spec)
    // coalesce on the count partials: they can never actually be NULL (every
    // merged group has >= 1 contributing row), but sum() marks them nullable
    // and the MV schema must be a fixed point across maintenance rounds
    val combine = spec.measures.flatMap(c => Seq(
      sum(s"sum_$c").as(s"sum_$c"),
      coalesce(sum(s"cnt_$c"), lit(0L)).as(s"cnt_$c"),
      min(s"min_$c").as(s"min_$c"), max(s"max_$c").as(s"max_$c"))) :+
      coalesce(sum("cnt_rows"), lit(0L)).as("cnt_rows")
    val merged = mv.unionByName(d)
      .groupBy(spec.keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
    mv.schema.fields.foldLeft(merged) { (df, f) =>
      df.withColumn(f.name, col(f.name).cast(f.dataType))
    }.select(mv.columns.map(col): _*)
  }

  /** Build the rollup of `base`, persist it at `mvPath`, and register the
    * persisted scan with the MV catalog for `basePath`. Returns the MV scan.
    */
  def materialize(spark: SparkSession, base: DataFrame, basePath: String,
      mvPath: String, spec: RollupSpec): DataFrame = {
    build(base, spec).write.mode("overwrite").parquet(mvPath)
    register(spark, basePath, mvPath, spec)
  }

  /** (Re-)register an already-persisted MV for `basePath`. */
  def register(spark: SparkSession, basePath: String, mvPath: String,
      spec: RollupSpec): DataFrame = {
    val mv = spark.read.parquet(mvPath)
    MvCatalog.register(basePath, spec.keys, spec.mvMeasures, mv)
    mv
  }

  /** Root paths of every file scan in the optimized plan — the spec- and
    * query-level proof that a rewritten aggregate reads the MV, not the base.
    */
  def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
        case _ => Nil
      }
    }.flatten

  private def requireNoBaseScan(df: DataFrame, basePath: String): Unit = {
    val paths = scanPaths(df)
    require(paths.nonEmpty && !paths.contains(MvCatalog.normalize(basePath)),
      s"rollup rewrite did not fire: scans=$paths")
  }

  private val ordersSpec = RollupSpec(
    keys = Seq("o_orderdate", "o_orderstatus"), measures = Seq("o_totalprice"))

  /** Incremental maintenance of a JOIN view — the delta-rule sibling of
    * [[maintain]]'s aggregate IVM: for V = A ⋈ B under appends ΔA, ΔB,
    *   ΔV = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB
    * and V₁ = V₀ ∪ ΔV. The A₀ ⋈ B₀ re-join — the big×big term a full
    * recompute pays — never runs; every delta term has at least one
    * delta-sized input, so at 100 TB the maintenance cost tracks the
    * batch, and with the stored view bucketed on the join key the union
    * lands without a shuffle. Append-only contract (the same as every
    * incremental path here); updates/deletes compose via the CDC tombstone
    * fold first.
    */
  def joinDelta(a0: DataFrame, da: DataFrame, b0: DataFrame, db: DataFrame,
                keys: Seq[String]): DataFrame =
    da.join(b0, keys)
      .unionByName(a0.join(db, keys))
      .unionByName(da.join(db, keys))

  val queries: Seq[Q] = Seq(

    // Join-view IVM lifecycle: seed V0 from the old order/customer slices,
    // apply the three-term delta for a late order batch AND late-arriving
    // dimension rows, serve V0 ∪ ΔV. Oracle: the full join recomputed from
    // scratch — value equality certifies the delta algebra (drop the ΔA⋈ΔB
    // term, or double a side, and the hash diverges).
    Q("q197_join_ivm",
      """SELECT o_orderkey, c_custkey, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey").as("c_custkey"),
          col("o_orderdate"))
      val customer = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      val cut = lit("1998-01-01")
      val a0 = orders.filter(col("o_orderdate") < cut)
      val da = orders.filter(col("o_orderdate") >= cut)
      val lateDim = pmod(col("c_custkey"), lit(10)) === 0
      val b0 = customer.filter(!lateDim)
      val db = customer.filter(lateDim)
      val v0 = a0.join(b0, Seq("c_custkey"))
      v0.unionByName(joinDelta(a0, da, b0, db, Seq("c_custkey")))
        .select("o_orderkey", "c_custkey", "c_mktsegment")
        .orderBy("o_orderkey")
    },
    // Monthly revenue by status, answered FROM THE DAILY MV by the optimizer
    // rule — the query is written against the base `orders` table; the
    // require() proves the optimized plan never scans it. The oracle
    // aggregates the base directly, certifying rewrite soundness end-to-end
    // (filter-on-key + expression-over-key + sum/count/max in one query).
    Q("q155_mv_rollup",
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus,
        |  count(1) AS cnt, round(sum(o_totalprice), 2) AS revenue,
        |  round(max(o_totalprice), 2) AS max_price
        |FROM orders
        |WHERE o_orderdate >= '1993-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val basePath = Tables.path(d, "orders")
      val mvPath = Scratch.dir("graft-mv") + "/orders_daily"
      materialize(s, Tables.orders(s, d), basePath, mvPath, ordersSpec)
      try {
        val out = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1993-01-01"))
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderstatus"))
          .agg(count(lit(1)).as("cnt"),
            round(sum("o_totalprice"), 2).as("revenue"),
            round(max("o_totalprice"), 2).as("max_price"))
          .orderBy("month", "o_orderstatus")
        requireNoBaseScan(out, basePath) // forces+caches the optimized plan
        out
      } finally MvCatalog.unregister(basePath) // no cross-query interference
    },

    // Incremental maintenance lifecycle: seed MV from the pre-1996 slice,
    // land the remainder as an append batch (persisted — the maintenance
    // plan reads ONLY mv+delta parquet, proven by scanPaths), merge, then
    // answer the yearly rollup from the maintained MV. Oracle recomputes
    // from the full base: value equality certifies maintenance exactness.
    Q("q156_mv_ivm",
      """SELECT strftime(o_orderdate, '%Y') AS year,
        |  count(1) AS cnt, round(sum(o_totalprice), 2) AS revenue,
        |  round(min(o_totalprice), 2) AS min_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val basePath = Tables.path(d, "orders")
      val root = Scratch.dir("graft-ivm")
      val orders = Tables.orders(s, d)
      val cut = lit("1996-01-01")
      build(orders.filter(col("o_orderdate") < cut), ordersSpec)
        .write.parquet(s"$root/mv0")
      orders.filter(col("o_orderdate") >= cut).write.parquet(s"$root/delta")
      val mv0 = s.read.parquet(s"$root/mv0")
      val delta = s.read.parquet(s"$root/delta")
      val maintained = maintain(mv0, delta, ordersSpec)
      val scans = {
        val paths = maintained.queryExecution.optimizedPlan.collect {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
        }.flatten
        require(!paths.contains(MvCatalog.normalize(basePath)),
          s"IVM maintenance plan re-scans the base: $paths")
        paths
      }
      require(scans.nonEmpty, "IVM plan has no file scans")
      maintained.write.parquet(s"$root/mv1")
      register(s, basePath, s"$root/mv1", ordersSpec)
      val out = orders
        .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("revenue"),
          round(min("o_totalprice"), 2).as("min_price"))
        .orderBy("year")
      try { requireNoBaseScan(out, basePath); out }
      finally MvCatalog.unregister(basePath)
    },
  )
}
