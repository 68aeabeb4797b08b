package graft.ops

import graft.core.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operators beyond the reference's declared surface that any analytics user
  * expects from a complete engine: set operations, semi/anti joins, rollup,
  * pivot, ranking/offset window functions, exact percentiles. Each is a thin
  * declaration over Catalyst built-ins with a DuckDB oracle.
  */
object Extended {

  val queries: Seq[Q] = Seq(

    // Set operations: customers with orders INTERSECT/EXCEPT suppliers' keys.
    Q("q51_set_ops",
      """WITH c AS (SELECT c_nationkey AS k FROM customer),
        | s AS (SELECT s_nationkey AS k FROM supplier)
        |SELECT 'both' AS src, k FROM (SELECT k FROM c INTERSECT SELECT k FROM s)
        |UNION ALL
        |SELECT 'cust_only' AS src, k FROM (SELECT k FROM c EXCEPT SELECT k FROM s)
        |ORDER BY src, k""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_nationkey").as("k"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      c.intersect(sup).select(lit("both").as("src"), col("k"))
        .unionByName(c.except(sup).select(lit("cust_only").as("src"), col("k")))
        .orderBy("src", "k")
    },

    // Semi and anti joins: customers with / without any order.
    Q("q52_semi_anti",
      """SELECT 'with_orders' AS src, count(1) AS cnt FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'no_orders' AS src, count(1) AS cnt FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY src""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("cnt")).select(lit("with_orders").as("src"), col("cnt"))
      val noO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("cnt")).select(lit("no_orders").as("src"), col("cnt"))
      noO.unionByName(withO).orderBy("src")
    },

    // ROLLUP: order counts by (status, priority) with subtotals and grand
    // total; grouping keys coalesced so the oracle's NULL handling matches.
    Q("q53_rollup",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(1) AS cnt, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("revenue"))
        .orderBy("status", "priority")
    },

    // CUBE over the same keys (all four grouping combinations).
    Q("q54_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR), 'ALL') AS yr,
        | count(1) AS cnt
        |FROM orders GROUP BY CUBE(o_orderstatus, EXTRACT(year FROM o_orderdate))
        |ORDER BY status, yr""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .withColumn("yr0", year(col("o_orderdate")))
        .cube("o_orderstatus", "yr0")
        .agg(count(lit(1)).as("cnt"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("yr0").cast("string"), lit("ALL")).as("yr"),
          col("cnt"))
        .orderBy("status", "yr")
    },

    // Arbitrary GROUPING SETS — an asymmetric set list neither ROLLUP nor
    // CUBE can express: (status, priority), (priority), ().
    Q("q69_grouping_sets",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(1) AS cnt, round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("revenue"))
        .orderBy("status", "priority")
    },

    // Pivot: event counts per user pivoted by event type (dynamic columns
    // fixed by sorted distinct values; oracle via conditional aggregation).
    Q("q55_pivot",
      """SELECT user_id,
        | count(1) FILTER (WHERE event_type = 'click') AS click,
        | count(1) FILTER (WHERE event_type = 'error') AS error,
        | count(1) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(1) FILTER (WHERE event_type = 'signup') AS signup,
        | count(1) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1 LIMIT 100""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("user_id")
        .limit(100)
    },

    // Offset window functions: lag/lead over each user's event sequence.
    Q("q56_lag_lead",
      """SELECT user_id, event_id,
        | lag(event_type) OVER w AS prev_et,
        | lead(event_type) OVER w AS next_et
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id LIMIT 1000""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          lag("event_type", 1).over(w).as("prev_et"),
          lead("event_type", 1).over(w).as("next_et"))
        .orderBy("user_id", "event_id")
        .limit(1000)
    },

    // Ranking family: rank/dense_rank/ntile over order values per segment.
    Q("q57_ranking",
      """SELECT c_mktsegment, o_orderkey,
        | rank() OVER w AS rnk, dense_rank() OVER w AS drnk, ntile(4) OVER w AS quartile
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY c_mktsegment, rnk, o_orderkey LIMIT 500""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_mktsegment"), col("rnk"), col("o_orderkey"))
        .limit(500)
    },

    // Exact interpolated percentiles (Spark percentile == DuckDB
    // quantile_cont by definition: linear interpolation).
    Q("q58_percentiles",
      """SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // one array-form aggregate: a single value-map pass serves all three
      // quantiles (three separate percentile aggs triple the work)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p90"),
          round(element_at(col("ps"), 3), 4).as("p99"))
        .orderBy("l_returnflag")
    },

    // The 100 TB percentile path: quantiles over a deterministic bounded
    // sample — Scale.kmvSample keeps the 1024 rows with the smallest content
    // hash per group (per-partition bounded heaps, then one window over
    // partitions×k survivors; the full relation is never sorted and state is
    // O(k) per group), and the exact interpolated quantile runs on the
    // sample. "k smallest hashes" is a uniform sample any engine reproduces
    // bit-for-bit, so DuckDB recomputes the identical estimate and the
    // driver gate compares real values. The earlier form computed the exact
    // full-data percentiles in the same plan just to emit within-1%
    // booleans, making the "bounded state" variant slower than exact q58 —
    // the round-4 finding this replaces. The O(1/eps)-state GK sketch
    // (approx_percentile) remains the production operator; its error bound
    // stays certified in ScaleSpec, where sketch internals belong.
    Q("q63_percentiles_approx",
      """WITH s AS (
        |  SELECT l_returnflag, l_extendedprice FROM lineitem
        |  QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' ||
        |                 CAST(l_linenumber AS VARCHAR)), l_extendedprice) <= 1024)
        |SELECT l_returnflag,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_est,
        | round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_est,
        | round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_est
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val key = concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))
      graft.ops.Scale.kmvSample(Tables.lineitem(s, d), "l_returnflag",
          md5(key), col("l_extendedprice"), k = 1024)
        .groupBy("l_returnflag")
        .agg(expr("percentile(sample_value, array(0.5, 0.9, 0.99))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p50_est"),
          round(element_at(col("ps"), 2), 4).as("p90_est"),
          round(element_at(col("ps"), 3), 4).as("p99_est"))
        .orderBy("l_returnflag")
    },

    // Scalar subquery: orders above their segment's average value.
    Q("q59_above_avg",
      """WITH seg AS (
        |  SELECT c_mktsegment, avg(o_totalprice) AS avg_price
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1)
        |SELECT c_mktsegment, count(1) AS n_above
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN seg USING (c_mktsegment)
        |WHERE o_totalprice > avg_price
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val oc = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      val seg = oc.groupBy("c_mktsegment").agg(avg("o_totalprice").as("avg_price"))
      oc.join(broadcast(seg), "c_mktsegment")
        .filter(col("o_totalprice") > col("avg_price"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_above"))
        .orderBy("c_mktsegment")
    },

    // Full-outer join: high-balance customer counts vs supplier counts per
    // nation, where each side covers a different nation subset (the balance
    // filters guarantee unmatched rows on BOTH sides, so the outer semantics
    // are actually exercised, not vacuously inner). Both inputs are
    // per-nation aggregates — small enough that at any corpus scale the
    // outer join runs after the reduction, never on raw rows.
    Q("q127_full_outer",
      """WITH c AS (
        |  SELECT c_nationkey AS nk, count(1) AS n_cust
        |  FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
        | s AS (
        |  SELECT s_nationkey AS nk, count(1) AS n_supp
        |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
        |SELECT coalesce(c.nk, s.nk) AS nk,
        |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp,
        |  CASE WHEN c.nk IS NULL THEN 'supp_only'
        |       WHEN s.nk IS NULL THEN 'cust_only' ELSE 'both' END AS side
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk
        |ORDER BY nk""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_cust"))
      val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("cnk") === col("snk"), "full_outer")
        .select(coalesce(col("cnk"), col("snk")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          when(col("cnk").isNull, "supp_only")
            .when(col("snk").isNull, "cust_only")
            .otherwise("both").as("side"))
        .orderBy("nk")
    },

    // RANGE window frame: trailing-7-day revenue per order day. The frame is
    // VALUE-based (a sparse calendar must reach back 6 days, not 6 rows) —
    // Spark expresses it as rangeBetween over epoch-day ints, DuckDB as a
    // date interval; both see the identical per-day pre-aggregate, so the
    // short frame sums compare exactly at 2 decimals.
    Q("q135_range_frame",
      """WITH d AS (
        |  SELECT o_orderdate AS day, round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT day, rev,
        |  round(sum(rev) OVER (ORDER BY day
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2) AS rev7
        |FROM d ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(round(sum("o_totalprice"), 2).as("rev"))
      val w = Window.orderBy(col("dayn")).rangeBetween(-6, 0)
      daily.withColumn("dayn", datediff(col("day"), lit("1970-01-01")))
        .withColumn("rev7", round(sum("rev").over(w), 2))
        .select("day", "rev", "rev7")
        .orderBy("day")
    },

    // Statistical aggregate family: correlation, population covariance and
    // stddev of (quantity, price) per return flag — rounded to digits far
    // inside double accumulation error for these magnitudes.
    Q("q136_stats_agg",
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        | round(covar_pop(l_quantity, l_extendedprice), 0) AS covar_qp,
        | round(stddev_pop(l_quantity), 4) AS sd_q
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qp"),
          round(covar_pop("l_quantity", "l_extendedprice"), 0).as("covar_qp"),
          round(stddev_pop("l_quantity"), 4).as("sd_q"))
        .orderBy("l_returnflag")
    },

    // Date-spine gap filling: a generated calendar (sequence over the
    // corpus's min..max day) left-joined against the sparse per-day
    // aggregate, missing days zero-filled and flagged — the standard
    // time-series densification before any rolling computation. The spine
    // generates from ONE 2-value aggregate row, never a driver loop.
    Q("q141_gap_fill",
      """WITH d AS (
        |  SELECT o_orderdate AS day, count(1) AS n_orders,
        |         round(sum(o_totalprice), 2) AS rev
        |  FROM orders WHERE o_totalprice > 450000
        |                AND o_orderdate >= DATE '1995-01-01'
        |                AND o_orderdate < DATE '1995-03-01' GROUP BY 1),
        | bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        | spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
        |           FROM bounds)
        |SELECT s.day, coalesce(d.n_orders, 0) AS n_orders,
        |  coalesce(d.rev, 0.0) AS rev,
        |  CASE WHEN d.day IS NULL THEN 1 ELSE 0 END AS gap
        |FROM spine s LEFT JOIN d ON d.day = s.day
        |ORDER BY s.day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000 &&
          col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1995-03-01"))
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("rev"))
      val bounds = daily.agg(min("day").as("lo"), max("day").as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      spine.join(daily.withColumnRenamed("day", "dday"),
          col("day") === col("dday"), "left")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("rev"), lit(0.0)).as("rev"),
          when(col("dday").isNull, 1).otherwise(0).as("gap"))
        .orderBy("day")
    },

    // EXCEPT ALL / INTERSECT ALL: the bag-semantics set operations (q51
    // covers the DISTINCT forms) — multiplicities must survive, so the
    // fixture counts how many times each nation key appears on each side.
    Q("q142_set_ops_all",
      """SELECT 'inter_all' AS src, k, count(1) AS cnt FROM (
        |  SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 9000
        |  INTERSECT ALL
        |  SELECT s_nationkey FROM supplier) GROUP BY 2
        |UNION ALL
        |SELECT 'except_all' AS src, k, count(1) AS cnt FROM (
        |  SELECT s_nationkey AS k FROM supplier
        |  EXCEPT ALL
        |  SELECT c_nationkey FROM customer WHERE c_acctbal > 9000) GROUP BY 2
        |ORDER BY src, k""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_nationkey").as("k"))
      val sup = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      val inter = c.intersectAll(sup).groupBy("k").agg(count(lit(1)).as("cnt"))
        .select(lit("inter_all").as("src"), col("k"), col("cnt"))
      val exc = sup.exceptAll(c).groupBy("k").agg(count(lit(1)).as("cnt"))
        .select(lit("except_all").as("src"), col("k"), col("cnt"))
      inter.unionByName(exc).orderBy("src", "k")
    },

    // Blocked fuzzy join (record linkage): typo'd variants of document
    // prefixes re-matched to their originals by edit distance. The join is
    // BLOCKED on (first-4-chars, length) so the quadratic levenshtein
    // verify runs only inside blocks — the standard linkage shape; the
    // planted single-char corruption sits past position 5, so blocking
    // never loses a true match. Both engines implement the same classic
    // Wagner-Fischer levenshtein, value-exact.
    Q("q145_fuzzy_join",
      """WITH p AS (
        |  SELECT doc_id, substring(trim(text), 1, 30) AS key
        |  FROM documents WHERE length(trim(text)) >= 30),
        | v AS (
        |  SELECT doc_id + 500000 AS vid,
        |    substring(key, 1, 5 + CAST(doc_id % 15 AS INT)) || 'Z' ||
        |    substring(key, 7 + CAST(doc_id % 15 AS INT)) AS vkey
        |  FROM p WHERE doc_id % 50 = 0)
        |SELECT v.vid, p.doc_id, CAST(levenshtein(v.vkey, p.key) AS BIGINT) AS dist
        |FROM v JOIN p ON substring(v.vkey, 1, 4) = substring(p.key, 1, 4)
        |              AND length(v.vkey) = length(p.key)
        |WHERE levenshtein(v.vkey, p.key) <= 2
        |ORDER BY vid, doc_id""".stripMargin) { (s, d) =>
      val p = Tables.documents(s, d)
        .select(col("doc_id"), substring(trim(col("text")), 1, 30).as("key"))
        .filter(length(trim(col("text"))) >= 30)
      val v = p.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 500000).as("vid"),
          concat(expr("substring(key, 1, 5 + cast(doc_id % 15 as int))"), lit("Z"),
            expr("substring(key, 7 + cast(doc_id % 15 as int))")).as("vkey"))
      v.join(p, substring(col("vkey"), 1, 4) === substring(col("key"), 1, 4) &&
          length(col("vkey")) === length(col("key")))
        .filter(levenshtein(col("vkey"), col("key")) <= 2)
        .select(col("vid"), col("doc_id"),
          levenshtein(col("vkey"), col("key")).cast("long").as("dist"))
        .orderBy("vid", "doc_id")
    },

    // Unpivot (melt): the q55 pivoted per-user event counts folded back to
    // long format — wide→long is the inverse reshaping surface, with the
    // oracle's UNPIVOT over the same conditional-aggregation CTE.
    Q("q146_unpivot",
      """WITH wide AS (
        |  SELECT user_id,
        |   count(1) FILTER (WHERE event_type = 'click') AS click,
        |   count(1) FILTER (WHERE event_type = 'purchase') AS purchase,
        |   count(1) FILTER (WHERE event_type = 'view') AS view
        |  FROM events GROUP BY 1)
        |SELECT user_id, kind, cnt
        |FROM wide UNPIVOT (cnt FOR kind IN (click, purchase, view))
        |WHERE user_id < 200
        |ORDER BY user_id, kind""".stripMargin) { (s, d) =>
      val wide = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(count(lit(1)))
        .na.fill(0)
      wide.unpivot(Array(col("user_id")),
          Array(col("click"), col("purchase"), col("view")), "kind", "cnt")
        .filter(col("user_id") < 200)
        .orderBy("user_id", "kind")
    },

    // Distribution window functions: percent_rank and cume_dist are exact
    // rationals of row counts — both engines produce bit-identical IEEE
    // doubles from the same integer divisions, no rounding needed.
    Q("q137_dist_windows",
      """SELECT c_mktsegment, o_orderkey,
        | percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey)
        |ORDER BY c_mktsegment, o_orderkey LIMIT 1000""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .orderBy("c_mktsegment", "o_orderkey")
        .limit(1000)
    },

    // Share-of-parent report (the drill-down every BI layer serves):
    // nation revenue as exact integer basis points of its region — cents
    // sums cross-multiplied, no float ratio; region totals re-aggregate
    // from the nation relation (tiny) instead of re-scanning facts.
    Q("q201_share_of_parent",
      """WITH nat AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        | reg AS (SELECT region, CAST(sum(cents) AS BIGINT) AS rcents
        |         FROM nat GROUP BY 1)
        |SELECT nat.region, nation, cents,
        |  cents * 10000 // rcents AS share_bp
        |FROM nat JOIN reg ON nat.region = reg.region
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val nat = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      val reg = nat.groupBy("region").agg(sum("cents").as("rcents"))
      nat.join(broadcast(reg), "region")
        .select(col("region"), col("nation"), col("cents"),
          expr("cents * 10000 div rcents").as("share_bp"))
        .orderBy("region", "nation")
    },
  )
}
