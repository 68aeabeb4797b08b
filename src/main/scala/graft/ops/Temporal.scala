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
    val reserved = Seq("__ts", "__tag")
    val collisions = (reserved ++ rightCols).filter(left.columns.contains) ++
      rightCols.filter(reserved.contains)
    require(collisions.isEmpty,
      s"asofJoin: left columns collide with reserved/right names: ${collisions.mkString(", ")}")
    val lTagged = left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))
    // NULL right timestamps would sort first (Spark default nulls-first asc)
    // and their payload would carry into every left row — ASOF `<=` has no
    // match semantics for them (DuckDB likewise excludes NULL-ts rows).
    val rTagged = right
      .filter(col(rightTs).isNotNull)
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

  /** Range (point-in-interval) join without the cross product: Spark plans a
    * raw `ts BETWEEN start AND end` join as BroadcastNestedLoop — quadratic.
    * Instead both sides are bucketed into fixed time bins (points to their
    * bin, intervals to every bin they cover), equi-joined on (key, bin), and
    * exact containment filtered after. A point lives in exactly one bin, so
    * no pair duplicates. Join fan-out is bounded by rows-per-bin; pick
    * `binSeconds` near the typical interval length so intervals explode to
    * O(1) bins.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                tsCol: String, startCol: String, endCol: String,
                binSeconds: Long = 3600L): DataFrame = {
    val p = points.withColumn("__bin", floor(unix_seconds(col(tsCol)) / binSeconds))
    val i = intervals.withColumn("__bin", explode(sequence(
      floor(unix_seconds(col(startCol)) / binSeconds),
      floor(unix_seconds(col(endCol)) / binSeconds))))
    p.join(i, Seq(key, "__bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bin")
  }

  val queries: Seq[Q] = Seq(

    // Bin-bucketed range join oracled against DuckDB's plain inequality
    // join: clicks inside the hour before each user's first purchase.
    Q("q68_range_join",
      """WITH fp AS (SELECT user_id, min(ts) AS end_ts
        |            FROM events WHERE event_type = 'purchase' GROUP BY 1),
        | win AS (SELECT user_id, end_ts - INTERVAL 1 HOUR AS start_ts, end_ts FROM fp)
        |SELECT w.user_id, count(c.event_id) AS n_clicks
        |FROM win w LEFT JOIN events c
        |  ON c.user_id = w.user_id AND c.event_type = 'click'
        |  AND c.ts >= w.start_ts AND c.ts <= w.end_ts
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val win = events.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("ts").as("end_ts"))
        .withColumn("start_ts", col("end_ts") - expr("INTERVAL 1 HOUR"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val matched = rangeJoin(clicks, win, "user_id", "ts", "start_ts", "end_ts")
        .groupBy("user_id").agg(count("event_id").as("n_clicks"))
      win.select("user_id").join(matched, Seq("user_id"), "left")
        .select(col("user_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy("user_id")
    },

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
