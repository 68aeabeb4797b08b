package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-authority scoring over a document/entity graph — the PageRank family,
  * integer-exact so any SQL engine replays the trajectory bit-for-bit.
  *
  * In a crawl-curation pipeline this ranks pages by link authority (a
  * standard quality prior for training-data selection, and the classic
  * companion signal to the content-side filters in [[Curation]]). The
  * engine-side shape is the textbook iterate: ranks live as (node, rank)
  * rows, each round joins ranks to the out-edge list on `src`, reduces
  * contributions by `dst`, and applies the damped update.
  *
  * Integer determinism (the [[Kmeans]] contract): ranks are fixed-point
  * longs at [[Scale]] per node; per-edge contribution is `rank DIV outdeg`
  * (truncating division over nonnegative values, identical to DuckDB's
  * `//`); the damped update is `Base + (85 · Σcontrib) DIV 100`. No float
  * ever enters, so there is no accumulation-order sensitivity and the
  * oracle's unrolled CTE replay hash-matches exactly.
  *
  * Scale shape at 100 TB: the edge list (narrow (src, dst, outdeg) longs) is
  * the loop invariant — cached once, reused every round; each iteration
  * shuffles only the N-row rank relation into the join and O(|E|) narrow
  * contribution rows into the `dst` aggregate (map-side partials collapse
  * per-partition repeats first). Nothing corpus-sized accumulates on the
  * driver, and the plan depth is bounded by the fixed iteration count. On a
  * real cluster the edge list would be bucketed by `src` so the per-round
  * join co-locates without re-shuffling the edges.
  */
object Graph {

  /** Fixed-point scale: initial rank per node, and the unit of all output. */
  val Scale = 1000000L

  /** Damping 0.85 as an integer ratio; base = (1−d)·Scale. */
  val DampNum = 85L
  val DampDen = 100L
  val Base: Long = Scale * (DampDen - DampNum) / DampDen

  /** `iters` damped PageRank rounds over a directed edge list (`src`, `dst`
    * long columns). ASSUMES every node has outdeg ≥ 1 AND indeg ≥ 1 — true
    * structurally for an undirected graph encoded as both directions (the
    * q129 encoding), which is this operator's contract. On general directed
    * input the first round's inner join drops rank rows for indeg-0 nodes
    * (they stop appearing in the output) and their outgoing contributions
    * are silently lost in later rounds — a caller with genuinely directed
    * edges must first add back-edges or self-loops for sources and sinks
    * (the standard dangling-node treatment). Returns (node, rank); after
    * round 1 the row set is the indeg ≥ 1 nodes.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // loop invariant: out-edges annotated with outdeg, materialized once so
    // every round reuses the same narrow blocks instead of re-deriving them
    val e = edges.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint()
    var ranks = deg.select(col("src").as("node"), lit(Scale).as("rank"))
    for (_ <- 0 until iters) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy("dst")
        .agg(sum("contrib").as("c"))
        .select(col("dst").as("node"),
          (lit(Base) + expr(s"($DampNum * c) div $DampDen")).as("rank"))
    }
    ranks
  }

  /** The q129 fixture graph: the undirected bipartite supplier↔customer
    * trade graph — nodes are `custkey·2` and `suppkey·2+1`, with an edge per
    * DISTINCT (customer, supplier) pair that traded (lineitem ⋈ orders).
    * Both directions are emitted, so outdeg ≥ 1 and indeg ≥ 1 hold
    * structurally and the damped update covers every node.
    */
  def tradeEdges(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  private val Iters = 3

  // Oracle: the same three rounds unrolled as CTEs. `//` is DuckDB's
  // truncating integer division — identical to Spark's `div` on the
  // nonnegative longs used throughout.
  private def iterSql(i: Int): String = {
    val p = i - 1
    s"""r$i AS (
       |  SELECT e.dst AS node,
       |         ${Base} + (${DampNum} * SUM(r.r // e.outdeg)) // ${DampDen} AS r
       |  FROM e JOIN r$p r ON e.src = r.node
       |  GROUP BY 1)""".stripMargin
  }

  private val q129Sql: String =
    s"""WITH base AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       | e0 AS (SELECT c AS src, s AS dst FROM base
       |        UNION ALL SELECT s, c FROM base),
       | deg AS (SELECT src, CAST(count(1) AS BIGINT) AS outdeg
       |         FROM e0 GROUP BY 1),
       | e AS (SELECT e0.src, e0.dst, deg.outdeg FROM e0 JOIN deg USING (src)),
       | r0 AS (SELECT src AS node, CAST(${Scale} AS BIGINT) AS r FROM deg),
       |${(1 to Iters).map(iterSql).mkString(",\n")}
       |SELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS rank
       |FROM r$Iters ORDER BY rank DESC, node LIMIT 20""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q129_pagerank", q129Sql) { (s, d) =>
      pageRank(tradeEdges(s, d), Iters)
        .select(col("node").cast("long").as("node"), col("rank").cast("long").as("rank"))
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },
  )
}
