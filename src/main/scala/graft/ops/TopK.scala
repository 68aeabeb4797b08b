package graft.ops

import graft.core.{Q, Tables}
import graft.plans.TopKPerKey
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.functions._

/** Public face of the custom per-key top-k operator (graft.plans.TopKPerKey):
  * "best k rows per key" with bounded heaps instead of a partition sort, and
  * only k × keys-per-mapper candidate rows on the shuffle.
  *
  * Use a total order (unique tie-break column last) for deterministic
  * results — same contract as Writers.latestWins. Project the columns you
  * need BEFORE calling: the custom logical node is opaque to Catalyst's
  * column pruning, so the scan schema is whatever the input plan produces.
  */
object TopK {

  /** Exact global top-`k` with a dense 1..k `rankCol` — the serve-time
    * "ranked cut" idiom. The cut itself is `orderBy(order).limit(k)`
    * (TakeOrderedAndProject: per-mapper bounded heaps, never a
    * partition sort of the input), and only the <= k surviving rows pay
    * the rank window — so the single-partition WindowExec that makes a
    * naked `row_number().over(Window.orderBy(...))` a 100x-scale stall
    * runs over a k-row frame here. `order` must be a total order (unique
    * tie-break column last) for a deterministic cut, the
    * [[topKPerKey]] contract.
    */
  def rankedCut(df: DataFrame, k: Int, rankCol: String,
                order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol,
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(order: _*)).cast("long"))

  /** Top `k` rows of `df` per distinct value of `keyCols`, "top" meaning
    * first in `orderCols` order (e.g. `col("price").desc`). Output order
    * within a key is unspecified — compose with `.orderBy` for totals.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    // Route the order columns through the analyzer (df.sort) and lift the
    // resolved Catalyst SortOrders back out: Spark 4 Columns are lazy
    // ColumnNodes that only the session's analysis converts to expressions.
    val analyzedSort = df.sort(orderCols: _*).queryExecution.analyzed.asInstanceOf[Sort]
    val order = analyzedSort.order
    val lp = analyzedSort.child
    val resolver = df.sparkSession.sessionState.conf.resolver
    def attr(name: String) = lp.output.find(a => resolver(a.name, name)).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerKey: column '$name' not found in ${lp.output.map(_.name).mkString(", ")}"))
    GraftColumnBridge.ofRows(df.sparkSession,
      TopKPerKey(k, keyCols.map(attr), order, lp))
  }

  val queries: Seq[Q] = Seq(

    // The custom-operator stack end-to-end: logical TopKPerKey → injected
    // strategy → two TopKPerKeyExec heap passes around one hash exchange.
    // Unique (price desc, orderkey) total order makes the top-3 set
    // deterministic, so the window-rank oracle is value-exact.
    // TopKSpec pins plan shape (two passes, no Sort) and window equality.
    Q("q114_topk_per_key",
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice")
      topKPerKey(orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
        .orderBy("o_custkey", "o_orderkey")
    },
  )
}
