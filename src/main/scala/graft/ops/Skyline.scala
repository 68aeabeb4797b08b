package graft.ops

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D skyline (Pareto frontier): the rows no other row dominates, here with
  * one minimized and one maximized dimension (e.g. cheapest parts per size
  * class — the "best tradeoff" query behind supplier selection and any
  * cost/quality curation cut).
  *
  * A row (m, x) is dominated iff some other row (m', x') has m' <= m AND
  * x' >= x with at least one strict. The naive formulation is the O(n^2)
  * NOT EXISTS self-join (the oracle below runs it — fine for DuckDB at
  * sf0.01, fatal at 100 TB). The engine shape instead exploits that in 2D
  * the frontier is a staircase over the minimized dimension:
  *
  *  1. per-value reduce: groupBy(minCol).max(maxCol) — only the best x at
  *     each m can be on the frontier, so everything after phase 1 runs on
  *     the distinct-m relation, not the corpus (one map-side-combined
  *     shuffle, the only corpus-wide move);
  *  2. bucket prune: coarse-bucket m, per-bucket max(x), prefix-max over
  *     the (tiny, broadcast) ordered bucket summary — a value survives only
  *     if its x beats every strictly-lower bucket's best, which discards
  *     all but the near-staircase values BEFORE any global sort;
  *  3. exact staircase: a running strictly-preceding max over the pruned
  *     survivors (single-partition window, but over candidate values only —
  *     at real scale the survivor relation is frontier-sized, orders of
  *     magnitude below the input).
  *
  * Frontier rows then pull their full source rows back via an equi-join on
  * (m, x) — broadcast, the frontier is small by construction.
  */
object Skyline {

  /** Frontier (minCol, maxCol) value pairs: minimize `minCol`, maximize
    * `maxCol`. `bucket(m)` must be a monotone coarsening of `minCol`
    * (default: floor) — used only for pruning, never for semantics.
    */
  def frontierValues(df: DataFrame, minCol: String, maxCol: String,
                     bucket: Column => Column = floor(_)): DataFrame = {
    val perVal = df.groupBy(minCol).agg(max(maxCol).as("__gmax"))
      .withColumn("__b", bucket(col(minCol)))
    // bucket summary: per-bucket best x, then each bucket's
    // strictly-lower-buckets best (runs over B rows — broadcastable)
    val wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    val summary = perVal.groupBy("__b").agg(max("__gmax").as("__bmax"))
      .withColumn("__lower", max("__bmax").over(wb))
    // prune: dominated by a strictly lower bucket's best -> cannot be on
    // the staircase (that best has strictly smaller m and >= x)
    val pruned = perVal.join(broadcast(summary.select("__b", "__lower")), "__b")
      .filter(col("__lower").isNull || col("__gmax") > col("__lower"))
    // exact: strictly-preceding running max over surviving values
    val wv = Window.orderBy(minCol).rowsBetween(Window.unboundedPreceding, -1)
    pruned
      .withColumn("__run", max("__gmax").over(wv))
      .filter(col("__run").isNull || col("__gmax") > col("__run"))
      .select(col(minCol), col("__gmax").as(maxCol))
  }

  /** All source rows on the frontier (ties at a frontier point all kept —
    * none of them is strictly dominated).
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
                bucket: Column => Column = floor(_)): DataFrame =
    df.join(broadcast(frontierValues(df, minCol, maxCol, bucket)),
      Seq(minCol, maxCol))

  val queries: Seq[Q] = Seq(

    // Cheapest-price / largest-size Pareto frontier over part. The oracle
    // is the textbook NOT EXISTS dominance test — quadratic, which is
    // exactly why the engine runs the staircase form instead.
    Q("q164_skyline",
      """SELECT p_partkey, p_retailprice, p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      skyline2d(Tables.part(s, d).select("p_partkey", "p_retailprice", "p_size"),
          "p_retailprice", "p_size")
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    },
  )
}
