package graft.ops

import graft.core.{Q, Tables}
import graft.write.Writers
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's complete SQL operator inventory (SURVEY.md §2), each as an
  * idiomatic DataFrame query over the driver test tables plus a DuckDB oracle.
  *
  * Conventions that make the oracle hash-compare deterministic:
  *  - every query ends in a total ORDER BY over a unique key;
  *  - per-row scalar arithmetic is emitted raw (IEEE-identical across
  *    engines); order-dependent aggregates (sum/avg of doubles) are rounded;
  *  - timestamps are emitted as formatted strings at microsecond precision
  *    (events.ts is nanos in parquet; both engines truncate to micros);
  *  - counts are BIGINT on both sides; DuckDB integer sums are cast (its
  *    sum(int) is HUGEINT).
  */
object Relational {

  private val tsFmtSpark = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val tsFmtDuck  = "%Y-%m-%d %H:%M:%S.%f"

  val queries: Seq[Q] = Seq(

    // A1/A2/F3/O1 — grouped aggregation with sums/avgs (TPC-H Q1 shape).
    Q("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         | round(sum(l_quantity), 2) AS sum_qty,
         | round(sum(l_extendedprice), 2) AS sum_base_price,
         | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         | round(avg(l_quantity), 4) AS avg_qty,
         | round(avg(l_discount), 4) AS avg_disc,
         | count(1) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // F1 + A1 — the reference's MAU summary (config/mau_summary.py:4-10):
    // month bucket + exact COUNT(DISTINCT user).
    Q("q02_mau",
      """SELECT strftime(ts, '%Y-%m') AS month, count(DISTINCT user_id) AS mau
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(countDistinct("user_id").as("mau"))
        .orderBy("month")
    },

    // Wf2/Wf3/A5 — channel summary (config/channel_summary.py:4-11):
    // FIRST_VALUE/LAST_VALUE over the explicit full frame, then DISTINCT.
    Q("q03_channel_summary",
      """SELECT DISTINCT user_id,
        | first_value(event_type) OVER w AS first_et,
        | last_value(event_type) OVER w AS last_et
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"),
          first("event_type").over(w).as("first_et"),
          last("event_type").over(w).as("last_et"))
        .distinct()
        .orderBy("user_id")
    },

    // The SURVEY §4 scale rewrite of q03: first/last channel per user as
    // min_by/max_by aggregation — ONE shuffle (partial-aggregated groupBy)
    // instead of window + DISTINCT's two. Identical results (same oracle
    // shape as q03); PlanSpec asserts the single-exchange plan.
    Q("q64_channel_minby",
      """SELECT DISTINCT user_id,
        | first_value(event_type) OVER w AS first_et,
        | last_value(event_type) OVER w AS last_et
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min_by(col("event_type"), struct(col("ts"), col("event_id"))).as("first_et"),
          max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_et"))
        .orderBy("user_id")
    },

    // The automated form of the q64 rewrite: the query is written as plain
    // SQL rank-1 window dedup (the Wf1 idiom a reference user would type),
    // and graft.plans.RankOneWindowToAggregate rewrites it to a single
    // max_by aggregation — no Window, no sort, map-side partials. The extra
    // o_totalprice conjunct exercises the rule's filter-splitting path
    // (applied to the winner, exactly as the window form would).
    // RankOneWindowToAggregateSpec pins plan shape + A/B equality.
    Q("q113_sql_latest_order",
      """SELECT o_custkey, o_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS seq FROM orders)
        |WHERE seq = 1 AND o_totalprice > 1000
        |ORDER BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_q113")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          | date_format(o_orderdate, 'yyyy-MM-dd') AS odate, o_totalprice
          |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS seq FROM orders_q113)
          |WHERE seq = 1 AND o_totalprice > 1000
          |ORDER BY o_custkey""".stripMargin)
    },

    // A2/F2-F5 — NPS summary shape (config/nps_summary.py:4-11): CASE with no
    // ELSE (NULL ignored by SUM), ::float cast, ROUND(x, 2).
    Q("q04_nps_summary",
      """SELECT strftime(ts, '%Y-%m-%d') AS date,
        | round(CAST(sum(CASE WHEN value >= 300 THEN 1 WHEN value <= 100 THEN -1 END) AS DOUBLE) * 100 / count(1), 2) AS nps
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("date"))
        .agg(round(
          sum(when(col("value") >= 300, 1).when(col("value") <= 100, -1)).cast("double")
            * 100 / count(lit(1)), 2).as("nps"))
        .orderBy("date")
    },

    // Wf1/P3 — latest-wins dedup via ROW_NUMBER ... WHERE seq = 1
    // (UpdateSymbol_v3.py:77-84), deterministic tiebreak on event_id.
    Q("q05_latest_event",
      s"""SELECT user_id, event_type, event_id,
         | strftime(ts, '$tsFmtDuck') AS ts_s, value
         |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
         |      ORDER BY ts DESC, event_id DESC) AS seq FROM events)
         |WHERE seq = 1 ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
      Writers.latestWins(Tables.events(s, d),
          keys = Seq("user_id", "event_type"), orderCols = Seq("ts", "event_id"))
        .select(col("user_id"), col("event_type"), col("event_id"),
          date_format(col("ts"), tsFmtSpark).as("ts_s"), col("value"))
        .orderBy("user_id", "event_type")
    },

    // A4 — SELECT DISTINCT (UpdateSymbol_v2.py:78).
    Q("q06_distinct_flags",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2") { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // J1 + A1 — inner equi-join + grouped agg (config/mau_summary.py:7-8).
    Q("q07_join_agg",
      """SELECT c_mktsegment, count(1) AS order_cnt,
        | round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("c_mktsegment")
    },

    // J2 — left outer equi-join (config/channel_summary.py:10-11).
    Q("q08_left_join",
      """SELECT c_custkey, count(o_orderkey) AS order_cnt,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count("o_orderkey").as("order_cnt"),
          round(coalesce(sum("o_totalprice"), lit(0)), 2).as("total_spend"))
        .orderBy("c_custkey")
    },

    // Multi-way join with broadcast dimension tables — the 100 TB plan:
    // region/nation broadcast, the orders->customer join shuffles once.
    Q("q09_region_revenue",
      """SELECT r_name, count(1) AS order_cnt, round(sum(o_totalprice), 2) AS revenue
        |FROM region
        | JOIN nation ON n_regionkey = r_regionkey
        | JOIN customer ON c_nationkey = n_nationkey
        | JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("order_cnt"), round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("r_name")
    },

    // F-batch — scalar string/math/conditional functions (SURVEY §2.9), all
    // per-row (bit-exact across engines, no rounding needed).
    Q("q10_scalar_funcs",
      """SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_type, 1, 5) AS type5,
        | p_brand || '-' || p_name AS brand_name,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS devowel,
        | p_retailprice * 2 AS double_price,
        | CASE WHEN p_size > 25 THEN 'L' WHEN p_size > 10 THEN 'M' ELSE 'S' END AS size_class
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat(col("p_brand"), lit("-"), col("p_name")).as("brand_name"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devowel"),
        (col("p_retailprice") * 2).as("double_price"),
        when(col("p_size") > 25, "L").when(col("p_size") > 10, "M").otherwise("S").as("size_class"))
        .orderBy("p_partkey")
    },

    // F1/F7/F8 — date formatting + date grouping.
    Q("q11_monthly_orders",
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(1) AS order_cnt,
        | round(sum(o_totalprice), 2) AS revenue,
        | min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day,
        | max(strftime(o_orderdate, '%Y-%m-%d')) AS last_day
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("order_cnt"),
          round(sum("o_totalprice"), 2).as("revenue"),
          min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("first_day"),
          max(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("last_day"))
        .orderBy("month")
    },

    // F10 — JSON field extraction (UpdateCountry.py:43-48 shape).
    Q("q12_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
        | count(1) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy((get_json_object(col("props"), "$.k").cast("int") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
        .orderBy("k_bucket")
    },

    // W4 — keyed upsert semantics (MySQL_to_Redshift_v2.py:60-61), via the
    // engine's Writers.upsert (anti-join ∪ incoming).
    Q("q13_upsert",
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        | incoming AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice
        |              FROM base WHERE o_orderkey % 5 = 0)
        |SELECT * FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
        |UNION ALL SELECT * FROM incoming ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val incoming = base.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Writers.upsert(base, incoming, Seq("o_orderkey")).orderBy("o_orderkey")
    },

    // W3 — incremental append + latest-wins dedup (UpdateSymbol_v3.py:60-90):
    // a re-delivered, newer copy of every third event must win.
    Q("q14_incremental_dedup",
      s"""WITH base AS (SELECT event_id, ts, value FROM events),
         | redelivered AS (SELECT event_id, ts + INTERVAL 1 HOUR AS ts, value + 1000 AS value
         |                 FROM base WHERE event_id % 3 = 0),
         | unioned AS (SELECT * FROM base UNION ALL SELECT * FROM redelivered),
         | ranked AS (SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) AS seq
         |            FROM unioned)
         |SELECT event_id, strftime(ts, '$tsFmtDuck') AS ts_s, value
         |FROM ranked WHERE seq = 1 ORDER BY event_id""".stripMargin) { (s, d) =>
      val base = Tables.events(s, d).select("event_id", "ts", "value")
      val redelivered = base.filter(col("event_id") % 3 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
        .withColumn("value", col("value") + 1000)
      Writers.incrementalDedup(base, redelivered, Seq("event_id"), Seq("ts"))
        .select(col("event_id"), date_format(col("ts"), tsFmtSpark).as("ts_s"), col("value"))
        .orderBy("event_id")
    },

    // A3/C10 — the count validation gate as a query.
    Q("q15_count_gate",
      """SELECT count(1) AS cnt, CAST(count(1) >= 1000 AS INTEGER) AS passed
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .agg(count(lit(1)).as("cnt"), (count(lit(1)) >= 1000).cast("int").as("passed"))
    },

    // Gap-based sessionization over the events stream table: lag + running
    // sum of session starts — the batch form of session windows.
    Q("q16_sessionize",
      s"""WITH e AS (SELECT user_id, ts, event_id, epoch_us(ts) AS us FROM events),
         | lagged AS (SELECT user_id, ts, us,
         |   lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
         |   event_id FROM e),
         | flagged AS (SELECT user_id, ts, event_id,
         |   CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
         |   FROM lagged),
         | sess AS (SELECT user_id, ts,
         |   CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |   FROM flagged)
         |SELECT user_id, session_id, count(1) AS n_events,
         | strftime(min(ts), '$tsFmtDuck') AS start_ts,
         | strftime(max(ts), '$tsFmtDuck') AS end_ts
         |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val order = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev_us", lag("us", 1).over(order))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum("is_new").over(running))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(min("ts"), tsFmtSpark).as("start_ts"),
          date_format(max("ts"), tsFmtSpark).as("end_ts"))
        .orderBy("user_id", "session_id")
    },

    // Top-k by aggregate with deterministic tiebreak.
    Q("q17_top_orders",
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
  )
}
