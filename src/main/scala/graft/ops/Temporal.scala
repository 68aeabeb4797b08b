package graft.ops

import graft.core.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins, composed from the operators it
  * has (SURVEY §7.3 preference (a): compose before customizing).
  */
object Temporal {

  /** As-of join: for each left row, attach the latest right row with the
    * same key and `rightTs <= leftTs`. Implemented as the union-and-window
    * pattern: tag both sides, sort (key, ts, tag) with right-before-left on
    * ties, carry the last non-null right payload forward, keep left rows.
    *
    * One shuffle on the key (the window partition) — the same cost class as
    * any keyed window; no range cross-product ever forms, so it scales like
    * sessionization, not like an inequality join. `rightCols` must not
    * collide with left column names.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightCols: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))
    val rTagged = right
      .select((col(key) +: col(rightTs).as("__ts") +: rightCols.map(col)): _*)
      .withColumn("__tag", lit(0))
    // allowMissingColumns nulls out left-only columns on right rows and
    // vice versa — exactly the padding the carry-forward needs
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal ts (tag 0 < 1), so an
    // equal-timestamp right row is visible to the left row — ASOF `<=`
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__tag", "__ts")
  }

  val queries: Seq[Q] = Seq(

    // As-of join oracled against DuckDB's native ASOF JOIN: each purchase
    // event gets the user's latest click at or before it. The right side is
    // deduped to one click per (user, ts) so tie semantics are total on
    // both engines.
    Q("q67_asof_join",
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        | purchases AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, c.click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val clicks = events.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      asofJoin(purchases, clicks, key = "user_id", leftTs = "ts", rightTs = "ts",
          rightCols = Seq("click_id"))
        .select("event_id", "user_id", "click_id")
        .orderBy("event_id")
    },
  )
}
