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

  /** Type-2 slowly-changing dimension from an ordered fact stream: collapse
    * consecutive runs of `attr` per `key` into validity intervals
    * [valid_from, valid_to), open-ended for the current run. The classic
    * lag-filter-lead pipeline: one keyed window detects changes, a second
    * (same partitioning — no extra shuffle) numbers the runs and closes
    * each interval at the next run's start. `ord` columns must give a
    * total order within a key.
    */
  def scd2(src: DataFrame, key: String, attr: String, ord: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ord.map(col): _*)
    val changes = src
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
    val w2 = Window.partitionBy(key).orderBy(ord.map(col): _*)
    changes
      .withColumn("run_seq", row_number().over(w2))
      .withColumn("valid_to", lead(col(ord.head), 1).over(w2))
      .withColumn("valid_from", col(ord.head))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key), col("run_seq"), col(attr), col("valid_from"),
        col("valid_to"), col("is_current"))
  }

  val queries: Seq[Q] = Seq(

    // SCD type-2 build over each customer's order-priority history: the
    // warehouse dimension-maintenance pattern (the reference's W4 upsert
    // keeps only latest state; this keeps full validity history).
    Q("q163_scd2",
      """WITH chg AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        | runs AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        |  FROM chg WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey,
        |  CAST(row_number() OVER w AS INT) AS run_seq,
        |  o_orderpriority,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM runs
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, run_seq""".stripMargin) { (s, d) =>
      scd2(Tables.orders(s, d), "o_custkey", "o_orderpriority",
          Seq("o_orderdate", "o_orderkey"))
        .orderBy("o_custkey", "run_seq")
    },

    // 7-day rolling revenue per market segment via a RANGE frame over an
    // integer day index — exact integer cents, so the window sum is
    // engine-independent. The RANGE frame (not ROWS) makes calendar gaps
    // correct: a missing day shrinks the window instead of stretching it.
    Q("q168_rolling_revenue",
      """WITH daily AS (
        |  SELECT c_mktsegment,
        |    epoch_us(o_orderdate) // 86400000000 AS day_idx,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, day_idx, rev_cents,
        |  CAST(sum(rev_cents) OVER w AS BIGINT) AS roll7_cents,
        |  count(*) OVER w AS roll7_days
        |FROM daily
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY day_idx
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY c_mktsegment, day_idx""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day_idx"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("rev_cents"))
      val w = Window.partitionBy("c_mktsegment").orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("roll7_cents", sum("rev_cents").over(w))
        .withColumn("roll7_days", count(lit(1)).over(w))
        .orderBy("c_mktsegment", "day_idx")
    },

    // EWMA (α = 1/2) of daily event value per event type, EXACT in integer
    // arithmetic: with a dyadic α the recurrence E_n = (E_{n-1} + x_n)/2
    // unrolls to E_n = (x_1 + Σ_{i≥2} x_i·2^(i-2)) div 2^(n-1), so the
    // whole smoother is one cumulative window sum of shifted cents plus a
    // truncating division — no pow(), no float accumulation, bit-equal on
    // any engine. The 63-bit budget is split between the shift and the
    // cents magnitude, so the series is SEGMENTED: every 32 rows per
    // group the recurrence restarts from the segment's first value
    // ((rn−1) div 32 joins the window partition key). That caps the
    // shift at 30 bits and leaves ~2^31 cents (≈$21M/day/group) of
    // headroom; a 32-day-old sample weighs 2^-32 ≈ 0 in the true EWMA,
    // so the restart is numerically free while making the query
    // horizon-safe on any span — not just the test fixture's.
    Q("q169_ewma",
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        | seq AS (
        |  SELECT event_type, day_idx, cents,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day_idx) AS BIGINT) AS rn
        |  FROM daily),
        | seg AS (
        |  SELECT *, (rn - 1) // 32 AS segid, ((rn - 1) % 32) + 1 AS srn
        |  FROM seq),
        | terms AS (
        |  SELECT *, cents * (CAST(1 AS BIGINT) << CAST(greatest(srn - 2, 0) AS INT)) AS term
        |  FROM seg)
        |SELECT event_type, day_idx, cents,
        |  CAST(sum(term) OVER (PARTITION BY event_type, segid ORDER BY day_idx
        |                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    // (CAST(1 AS BIGINT) << CAST(srn - 1 AS INT)) AS ewma_cents
        |FROM terms ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_idx"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      val w = Window.partitionBy("event_type").orderBy("day_idx")
      daily
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("segid", expr("(rn - 1) div 32"))
        .withColumn("srn", expr("((rn - 1) % 32) + 1"))
        .withColumn("term",
          expr("cents * shiftleft(cast(1 as bigint), cast(greatest(srn - 2, 0) as int))"))
        .withColumn("ewma_cents", expr(
          "sum(term) over (partition by event_type, segid order by day_idx rows unbounded preceding)" +
          " div shiftleft(cast(1 as bigint), cast(srn - 1 as int))"))
        .select("event_type", "day_idx", "cents", "ewma_cents")
        .orderBy("event_type", "day_idx")
    },

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

    // CDC changelog apply: a synthesized binlog over customers (latest op
    // per key wins, terminal D deletes, U upserts the payload) lands
    // through Writers.applyChangelog — W4's general form, and the batch
    // shape a Debezium feed replays through.
    Q("q175_cdc_apply",
      """WITH latest AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS c_custkey, o_orderpriority AS c_mktsegment,
        |      round(o_totalprice, 2) AS c_acctbal,
        |      CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
        |      row_number() OVER (PARTITION BY o_custkey
        |                         ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
        |UNION ALL
        |SELECT c_custkey, c_mktsegment, c_acctbal FROM latest WHERE op <> 'D'
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val snapshot = Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val changes = Tables.orders(s, d).select(
        col("o_custkey").as("c_custkey"),
        col("o_orderpriority").as("c_mktsegment"),
        round(col("o_totalprice"), 2).as("c_acctbal"),
        col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 13 === 0, "D").otherwise("U").as("op"))
      graft.write.Writers
        .applyChangelog(snapshot, changes, Seq("c_custkey"), "seq", "op")
        .orderBy("c_custkey")
    },

    // Point-in-time (temporal) join: each order looks up the customer's
    // priority state AS OF 30 days earlier against the q163 SCD2 dimension
    // — scd2 ∘ asofJoin composing into the PIT-correctness query every
    // feature store serves. Same-date flips dedup to the latest run first
    // so the as-of pick is total on both engines.
    Q("q176_temporal_join",
      """WITH chg AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        | runs AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        |  FROM chg WHERE prev IS NULL OR prev <> o_orderpriority),
        | dim AS (
        |  SELECT o_custkey, o_orderpriority AS prior_priority,
        |    o_orderdate AS valid_from
        |  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                                     ORDER BY o_orderkey DESC) AS rn2
        |        FROM runs) WHERE rn2 = 1),
        | facts AS (
        |  SELECT o_orderkey, o_custkey,
        |    o_orderdate - INTERVAL 30 DAY AS lookup_ts
        |  FROM orders)
        |SELECT f.o_orderkey, f.o_custkey, d.prior_priority
        |FROM facts f ASOF LEFT JOIN dim d
        |  ON f.o_custkey = d.o_custkey AND d.valid_from <= f.lookup_ts
        |ORDER BY f.o_orderkey""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val runs = scd2(orders, "o_custkey", "o_orderpriority",
        Seq("o_orderdate", "o_orderkey"))
      val w2 = Window.partitionBy("o_custkey", "valid_from")
        .orderBy(col("run_seq").desc)
      val dim = runs.withColumn("rn2", row_number().over(w2))
        .filter(col("rn2") === 1)
        .select(col("o_custkey"),
          col("o_orderpriority").as("prior_priority"), col("valid_from"))
      val facts = orders.select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderdate") - expr("INTERVAL 30 DAY")).as("lookup_ts"))
      asofJoin(facts, dim, "o_custkey", "lookup_ts", "valid_from",
          Seq("prior_priority"))
        .select("o_orderkey", "o_custkey", "prior_priority")
        .orderBy("o_orderkey")
    },

    // Integer-exact linear trend per segment: OLS slope over (day, daily
    // cents) emitted as the EXACT rational num/den pair — n·Σxy − Σx·Σy
    // and n·Σx² − (Σx)², both shift-invariant (they're n²·cov and n²·var),
    // so x is rebased to days-since-first-sale purely as an overflow
    // guard without changing a single output bit. The only division is
    // one IEEE double at the end (bit-equal across engines); no float
    // ever accumulates.
    Q("q171_trend",
      """WITH daily AS (
        |  SELECT c_mktsegment,
        |    epoch_us(o_orderdate) // 86400000000 AS day_idx,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        | rebased AS (
        |  SELECT c_mktsegment,
        |    day_idx - min(day_idx) OVER (PARTITION BY c_mktsegment) AS x,
        |    cents AS y
        |  FROM daily),
        | sums AS (
        |  SELECT c_mktsegment, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM rebased GROUP BY 1)
        |SELECT c_mktsegment, n,
        |  n * sxy - sx * sy AS slope_num,
        |  n * sxx - sx * sx AS slope_den,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
        |    AS slope_cents_per_day
        |FROM sums ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day_idx"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      val rebased = daily.select(col("c_mktsegment"),
        (col("day_idx") - min("day_idx").over(
          Window.partitionBy("c_mktsegment"))).as("x"),
        col("cents").as("y"))
      rebased.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("c_mktsegment"), col("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
            .as("slope_cents_per_day"))
        .orderBy("c_mktsegment")
    },

    // OHLC resampling (downsample to daily bars): open/close are the
    // first/last values in (ts, event_id) total order — picked by rank-1
    // windows sharing one (type, day) partitioning, so the whole bar build
    // is a single shuffle; high/low/volume ride the same aggregate.
    Q("q194_ohlc",
      """WITH base AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
        |  FROM events),
        | ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, day
        |                               ORDER BY ts, event_id) AS rf,
        |            row_number() OVER (PARTITION BY event_type, day
        |                               ORDER BY ts DESC, event_id DESC) AS rl
        |  FROM base)
        |SELECT event_type, day,
        |  max(CASE WHEN rf = 1 THEN cents END) AS open,
        |  max(cents) AS high, min(cents) AS low,
        |  max(CASE WHEN rl = 1 THEN cents END) AS close,
        |  count(*) AS volume
        |FROM ranked GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val base = Tables.events(s, d).select(
        col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("cast(round(value * 100) as bigint)").as("cents"),
        col("ts"), col("event_id"))
      val wf = Window.partitionBy("event_type", "day")
        .orderBy(col("ts"), col("event_id"))
      val wl = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      base
        .withColumn("rf", row_number().over(wf))
        .withColumn("rl", row_number().over(wl))
        .groupBy("event_type", "day")
        .agg(
          max(when(col("rf") === 1, col("cents"))).as("open"),
          max("cents").as("high"), min("cents").as("low"),
          max(when(col("rl") === 1, col("cents"))).as("close"),
          count(lit(1)).as("volume"))
        .orderBy("event_type", "day")
    },

    // Linear interpolation over calendar gaps, integer-exact: missing days
    // get (y0·(d1−d) + y1·(d−d0)) div (d1−d0) — the weighted form keeps
    // every term nonnegative, so truncating and flooring division agree on
    // any engine (a (y1−y0)-slope form would put a sign into the division).
    // Neighbors come from IGNORE NULLS window carries over the generated
    // spine — no self-join. Gaps are planted by dropping every 5th day.
    Q("q189_interpolate",
      """WITH obs AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2 HAVING day % 5 <> 0),
        | spine AS (
        |  SELECT event_type, UNNEST(generate_series(mn, mx)) AS day
        |  FROM (SELECT event_type, min(day) AS mn, max(day) AS mx FROM obs GROUP BY 1)),
        | joined AS (
        |  SELECT s.event_type, s.day, o.cents FROM spine s
        |  LEFT JOIN obs o ON o.event_type = s.event_type AND o.day = s.day),
        | carried AS (
        |  SELECT event_type, day, cents,
        |    last_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wb AS d0,
        |    last_value(cents IGNORE NULLS) OVER wb AS y0,
        |    first_value(CASE WHEN cents IS NOT NULL THEN day END IGNORE NULLS)
        |      OVER wf AS d1,
        |    first_value(cents IGNORE NULLS) OVER wf AS y1
        |  FROM joined
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, day,
        |  CASE WHEN cents IS NOT NULL THEN cents
        |       WHEN d0 IS NULL OR d1 IS NULL THEN NULL
        |       ELSE (y0 * (d1 - day) + y1 * (day - d0)) // (d1 - d0) END AS cents_filled,
        |  cents IS NULL AS interpolated
        |FROM carried ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val obs = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
        .filter(col("day") % 5 =!= 0)
      val spine = obs.groupBy("event_type")
        .agg(min("day").as("mn"), max("day").as("mx"))
        .select(col("event_type"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
      val joined = spine.join(obs, Seq("event_type", "day"), "left")
      val wb = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      joined
        .withColumn("d0", last(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(wb))
        .withColumn("y0", last(col("cents"), ignoreNulls = true).over(wb))
        .withColumn("d1", first(when(col("cents").isNotNull, col("day")), ignoreNulls = true).over(wf))
        .withColumn("y1", first(col("cents"), ignoreNulls = true).over(wf))
        .select(col("event_type"), col("day"),
          when(col("cents").isNotNull, col("cents"))
            .when(col("d0").isNull || col("d1").isNull, lit(null).cast("long"))
            .otherwise(expr(
              "(y0 * (d1 - day) + y1 * (day - d0)) div (d1 - d0)"))
            .as("cents_filled"),
          col("cents").isNull.as("interpolated"))
        .orderBy("event_type", "day")
    },

    // Interval overlap (double-booking) detection WITHOUT a self-join: an
    // interval overlaps an earlier one of the same key iff its start is
    // below the running max of prior ends — one keyed window over the
    // start-sorted relation, where the naive form is an inequality
    // self-join (quadratic per key). Here: 30-day fulfillment windows per
    // customer; exact integer micros.
    Q("q186_overlap_detect",
      """WITH iv AS (
        |  SELECT o_custkey, o_orderkey,
        |    epoch_us(o_orderdate) AS start_us,
        |    epoch_us(o_orderdate + INTERVAL 30 DAY) AS end_us
        |  FROM orders),
        | flagged AS (
        |  SELECT o_custkey, o_orderkey, start_us,
        |    max(end_us) OVER (PARTITION BY o_custkey
        |                      ORDER BY start_us, o_orderkey
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max_end
        |  FROM iv)
        |SELECT o_custkey, o_orderkey,
        |  prev_max_end IS NOT NULL AND start_us < prev_max_end AS is_overlap
        |FROM flagged ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val iv = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("start_us"),
        expr("unix_micros(cast(o_orderdate + INTERVAL 30 DAY as timestamp))")
          .as("end_us"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("start_us"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, -1)
      iv.withColumn("prev_max_end", max("end_us").over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          (col("prev_max_end").isNotNull &&
            col("start_us") < col("prev_max_end")).as("is_overlap"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Rolling z-score anomaly flags with ZERO floats: |x−μ| > 2σ over the
    // trailing-7-day window rewritten by cross-multiplication into
    // (n·x − S)² > 4·(n·Q − S²) — population variance scaled by n², exact
    // BIGINTs end to end, so the flag itself (not a rounded proxy) is the
    // certified value. Magnitude contract: |n·x| < ~3e9 keeps the square
    // in range; larger magnitudes move the same identity to DECIMAL(38,0).
    Q("q182_rolling_anomaly",
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        | w AS (
        |  SELECT *, count(*) OVER win AS n,
        |    CAST(sum(cents) OVER win AS BIGINT) AS s,
        |    CAST(sum(cents * cents) OVER win AS BIGINT) AS q
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day_idx
        |                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day_idx, cents, n,
        |  (n * cents - s) * (n * cents - s) AS dev2_n2,
        |  4 * (n * q - s * s) AS var4_n2,
        |  (n * cents - s) * (n * cents - s) > 4 * (n * q - s * s) AS is_anomaly
        |FROM w ORDER BY event_type, day_idx""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day_idx"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
      val win = Window.partitionBy("event_type").orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
      daily
        .withColumn("n", count(lit(1)).over(win))
        .withColumn("s", sum("cents").over(win))
        .withColumn("q", sum(col("cents") * col("cents")).over(win))
        .select(col("event_type"), col("day_idx"), col("cents"), col("n"),
          ((col("n") * col("cents") - col("s")) *
            (col("n") * col("cents") - col("s"))).as("dev2_n2"),
          (lit(4L) * (col("n") * col("q") - col("s") * col("s"))).as("var4_n2"))
        .withColumn("is_anomaly", col("dev2_n2") > col("var4_n2"))
        .orderBy("event_type", "day_idx")
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
