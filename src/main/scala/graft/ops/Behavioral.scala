package graft.ops

import graft.core.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log behavioral analytics — ordered funnels and cohort retention,
  * the product-analytics companions to q16's sessionization (the
  * reference's MAU/NPS summaries are the degenerate single-stage versions
  * of these; see /root/reference/airflow/config/mau_summary.py:4).
  *
  * Scale shape, shared by both: every operator is one hash shuffle on
  * `user_id` (the window partition / groupBy key) followed by aggregations
  * whose keys are supersets of `user_id` — Spark's ClusteredDistribution
  * check accepts the existing hash partitioning for those, so no second
  * wide shuffle forms. Per-user state inside a window is O(events-per-user)
  * and streams through the sort — nothing corpus-sized concentrates
  * anywhere, which is exactly how these hold at 100 TB of clickstream.
  * Total order inside a user is (ts, event_id) — event_id breaks timestamp
  * ties so every engine replays the same sequence.
  */
object Behavioral {

  /** Ordered funnel over one keyed window chain: for each stage k, the
    * running min timestamp of stage-k events that happened at-or-after the
    * user's stage-(k-1) entry. Chaining selects reuses the SAME window
    * partitioning, so the whole multi-stage funnel is still one shuffle —
    * the join-per-stage formulation most warehouses use costs a shuffle per
    * stage for the same answer. Returns per-user stage-entry micros
    * (`st1..stN`, null = never reached) for `stages` event types in order.
    */
  def funnelStages(events: DataFrame, stages: Seq[String]): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col("ts"))
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (ev, i)) =>
      val cond =
        if (i == 0) col("event_type") === ev
        else col("event_type") === ev && col(s"st$i").isNotNull
      df.withColumn(s"st${i + 1}", min(when(cond, us)).over(w))
    }
    // each st column is a running min: non-null from its first qualifying
    // event onward and non-increasing after, so min over a user's row
    // snapshots (nulls ignored) IS the final stage-entry time
    val aggs = stages.indices.map(i => min(col(s"st${i + 1}")).as(s"st${i + 1}"))
    staged.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
  }

  /** [[funnelStages]] with a conversion deadline: stage k counts only if it
    * happens within `maxGapUs` of the stage-(k−1) entry — the form real
    * funnel reports use ("purchased within 24h of first click"). Same
    * single-shuffle window chain; the deadline is one more predicate in
    * each stage's running min.
    */
  def funnelStagesWithin(events: DataFrame, stages: Seq[String],
                         maxGapUs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val us = unix_micros(col("ts"))
    val staged = stages.zipWithIndex.foldLeft(events) { case (df, (ev, i)) =>
      val cond =
        if (i == 0) col("event_type") === ev
        else col("event_type") === ev && col(s"st$i").isNotNull &&
          us <= col(s"st$i") + maxGapUs
      df.withColumn(s"st${i + 1}", min(when(cond, us)).over(w))
    }
    val aggs = stages.indices.map(i => min(col(s"st${i + 1}")).as(s"st${i + 1}"))
    staged.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
  }

  val queries: Seq[Q] = Seq(

    // Ordered signup→view→click→purchase funnel: users reaching each stage
    // IN ORDER (each stage's clock starts at the previous stage's entry).
    Q("q161_funnel",
      """WITH s1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER w AS st1
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING)),
        | s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND st1 IS NOT NULL
        |                     THEN epoch_us(ts) END) OVER w AS st2
        |  FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND st2 IS NOT NULL
        |                     THEN epoch_us(ts) END) OVER w AS st3
        |  FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | s4 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND st3 IS NOT NULL
        |                     THEN epoch_us(ts) END) OVER w AS st4
        |  FROM s3 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | per_user AS (
        |  SELECT user_id, min(st1) AS st1, min(st2) AS st2,
        |         min(st3) AS st3, min(st4) AS st4
        |  FROM s4 GROUP BY 1)
        |SELECT count(st1) AS n_signup, count(st2) AS n_view,
        |       count(st3) AS n_click, count(st4) AS n_purchase
        |FROM per_user""".stripMargin) { (s, d) =>
      funnelStages(Tables.events(s, d),
          Seq("signup", "view", "click", "purchase"))
        .agg(
          count(col("st1")).as("n_signup"),
          count(col("st2")).as("n_view"),
          count(col("st3")).as("n_click"),
          count(col("st4")).as("n_purchase"))
    },

    // The funnel with a 6-hour conversion deadline per stage — the
    // windowed variant real funnel reports use. Same one-shuffle chain;
    // each stage's running min gains a deadline predicate against the
    // previous stage's entry (exact because a running min in event-time
    // order, once non-null, already equals the final entry).
    Q("q183_windowed_funnel",
      """WITH s1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER w AS st1
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING)),
        | s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND st1 IS NOT NULL
        |                     AND epoch_us(ts) <= st1 + 21600000000
        |                     THEN epoch_us(ts) END) OVER w AS st2
        |  FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND st2 IS NOT NULL
        |                     AND epoch_us(ts) <= st2 + 21600000000
        |                     THEN epoch_us(ts) END) OVER w AS st3
        |  FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | s4 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND st3 IS NOT NULL
        |                     AND epoch_us(ts) <= st3 + 21600000000
        |                     THEN epoch_us(ts) END) OVER w AS st4
        |  FROM s3 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | per_user AS (
        |  SELECT user_id, min(st1) AS st1, min(st2) AS st2,
        |         min(st3) AS st3, min(st4) AS st4
        |  FROM s4 GROUP BY 1)
        |SELECT count(st1) AS n_signup, count(st2) AS n_view,
        |       count(st3) AS n_click, count(st4) AS n_purchase
        |FROM per_user""".stripMargin) { (s, d) =>
      funnelStagesWithin(Tables.events(s, d),
          Seq("signup", "view", "click", "purchase"), maxGapUs = 21600000000L)
        .agg(
          count(col("st1")).as("n_signup"),
          count(col("st2")).as("n_view"),
          count(col("st3")).as("n_click"),
          count(col("st4")).as("n_purchase"))
    },

    // Weekly cohort retention: users bucketed by first-activity week,
    // distinct actives per (cohort_week, week_offset). Week index is an
    // exact integer division of epoch micros — no calendar functions whose
    // week-start conventions could differ across engines.
    Q("q162_cohort_retention",
      """WITH firsts AS (
        |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
        | cohorts AS (
        |  SELECT user_id, epoch_us(first_ts) // 604800000000 AS cohort_week
        |  FROM firsts),
        | active AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
        |  FROM events)
        |SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
        |       count(DISTINCT a.user_id) AS n_users
        |FROM cohorts c JOIN active a ON c.user_id = a.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val weekUs = 604800000000L
      val events = Tables.events(s, d)
      val cohorts = events.groupBy("user_id")
        .agg(min(unix_micros(col("ts"))).as("first_us"))
        .select(col("user_id"), expr(s"first_us div $weekUs").as("cohort_week"))
      // dedup weeks WITHIN each user (collect_set, bounded by the data's
      // week span) instead of .distinct() over (user_id, week): that
      // keeps `active` hash-partitioned on user_id alone, so the
      // user_id equi-join below co-locates with `cohorts` (also
      // user_id-partitioned by its aggregation) without a third shuffle
      val active = events
        .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs").as("week"))
        .groupBy("user_id")
        .agg(collect_set(col("week")).as("weeks"))
        .select(col("user_id"), explode(col("weeks")).as("week"))
      cohorts.join(active, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // Linear multi-touch attribution: every click in the hour before a
    // purchase splits that purchase's credit equally, in integer basis
    // points (10000 div n_touches — truncating, so a 3-touch purchase
    // credits 3×3333 and the 1bp residue is deliberately dropped rather
    // than floated). Touch matching rides the bin-bucketed rangeJoin — the
    // same no-cross-product shape as q68 — and credit aggregates by the
    // click's props channel. The oracle uses DuckDB's plain inequality
    // join; only the engine needs the scalable form.
    Q("q172_attribution",
      """WITH purchases AS (
        |  SELECT event_id AS pid, user_id, ts AS pts
        |  FROM events WHERE event_type = 'purchase'),
        | clicks AS (
        |  SELECT user_id, ts AS cts,
        |    CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS channel
        |  FROM events WHERE event_type = 'click'),
        | touches AS (
        |  SELECT p.pid, c.channel
        |  FROM purchases p JOIN clicks c
        |    ON c.user_id = p.user_id
        |    AND c.cts >= p.pts - INTERVAL 1 HOUR AND c.cts <= p.pts),
        | credit AS (
        |  SELECT pid, channel,
        |    10000 // (count(*) OVER (PARTITION BY pid)) AS bp
        |  FROM touches)
        |SELECT channel, CAST(sum(bp) AS BIGINT) AS credit_bp,
        |  count(*) AS n_touches
        |FROM credit GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
        .withColumn("start_ts", col("pts") - expr("INTERVAL 1 HOUR"))
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).as("channel"))
      val touches = Temporal.rangeJoin(clicks, purchases, "user_id",
          "cts", "start_ts", "pts")
        .select("pid", "channel")
      touches
        .withColumn("bp", expr(
          "10000 div (count(1) over (partition by pid))"))
        .groupBy("channel")
        .agg(sum("bp").as("credit_bp"), count(lit(1)).as("n_touches"))
        .orderBy("channel")
    },

    // Most-traveled 3-step behavior paths: event-type trigrams from each
    // user's (ts, event_id)-ordered stream — two leads over one keyed
    // window, then a count. Top 10 with a total tie order so the limit is
    // deterministic on any engine.
    Q("q173_path_trigrams",
      """WITH seq AS (
        |  SELECT user_id, event_type AS t1,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT t1, t2, t3, count(*) AS n
        |FROM seq WHERE t3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type").as("t1"),
          lead("event_type", 1).over(w).as("t2"),
          lead("event_type", 2).over(w).as("t3"))
        .filter(col("t3").isNotNull)
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(10)
    },

    // Ordered string aggregation (LISTAGG/STRING_AGG): each user's full
    // event-type sequence as one comma string, ordered by (ts, event_id).
    // Spark lacks an ordered string_agg aggregate; the deterministic form
    // collects (ts, event_id, type) structs, array_sorts (struct order =
    // lexicographic on fields — exactly the needed total order), then
    // projects and joins. One shuffle; the sort is per-group, local.
    Q("q192_string_agg",
      """SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ",").as("seq"))
        .orderBy("user_id")
    },

    // Contrastive-training negative pairs WITHOUT a cross join: docs are
    // hash-bucketed (md5 mod B), and each doc pairs with its next `k`
    // bucket-neighbors in hash order (window leads) — deterministic
    // pseudo-random negatives, fan-out exactly k per doc, shuffle keyed by
    // bucket. The naive "sample from everything" form is a cartesian; this
    // is the shape that survives a corpus that doesn't fit anywhere.
    Q("q193_negative_pairs",
      """WITH h AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 16 AS b
        |  FROM documents),
        | paired AS (
        |  SELECT doc_id, b,
        |    lead(doc_id, 1) OVER w AS n1,
        |    lead(doc_id, 2) OVER w AS n2
        |  FROM h WINDOW w AS (PARTITION BY b ORDER BY hh, doc_id))
        |SELECT doc_id, n1, n2 FROM paired
        |WHERE n1 IS NOT NULL AND n2 IS NOT NULL
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val h = Tables.documents(s, d).select(
        col("doc_id"),
        md5(col("doc_id").cast("string")).as("hh"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 16).as("b"))
      val w = Window.partitionBy("b").orderBy(col("hh"), col("doc_id"))
      h.withColumn("n1", lead("doc_id", 1).over(w))
        .withColumn("n2", lead("doc_id", 2).over(w))
        .filter(col("n1").isNotNull && col("n2").isNotNull)
        .select("doc_id", "n1", "n2")
        .orderBy("doc_id")
    },

    // Time-decayed popularity ("trending now"): rank users by activity
    // value under a 1-day half-life — the same dyadic trick as q169's
    // EWMA: 2^(day − min_day) integer weights make the decayed sum EXACT
    // (ordering is invariant to the common 2^(max−min) scale), where a
    // pow(0.5, age) form would rank by accumulated float error. Top 20
    // with a total tie order.
    //
    // Contract: the dyadic weight needs day−mn < 62 or the BIGINT shift
    // wraps (Spark masks the shift amount mod 64; DuckDB errors), so the
    // query CLAMPS to the trailing 60-day horizon before weighting —
    // which is also the right "trending" semantics: a day 60 half-lives
    // old contributes 2^-60 ≈ nothing, so dropping it never reorders the
    // top-k. The clamp is in both the plan and the oracle.
    Q("q200_decayed_topk",
      """WITH daily AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        | horizon AS (SELECT max(day) AS mx FROM daily),
        | recent AS (
        |  SELECT d.* FROM daily d CROSS JOIN horizon h WHERE d.day > h.mx - 60),
        | base AS (SELECT min(day) AS mn FROM recent),
        | scored AS (
        |  SELECT user_id,
        |    CAST(sum(cents * (CAST(1 AS BIGINT) << CAST(day - mn AS INT))) AS BIGINT)
        |      AS decayed_score
        |  FROM recent CROSS JOIN base GROUP BY 1)
        |SELECT user_id, decayed_score FROM scored
        |ORDER BY decayed_score DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
      // materialized once: the horizon aggregate, the min-day base, and
      // the final weighting all consume it — unmaterialized, the events
      // aggregation would run three times
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
        .localCheckpoint()
      val horizon = daily.agg(max("day").as("mx"))
      val recent = daily.crossJoin(broadcast(horizon))
        .filter(col("day") > col("mx") - lit(60))
        .drop("mx")
      val base = recent.agg(min("day").as("mn"))
      recent.crossJoin(broadcast(base))
        .groupBy("user_id")
        .agg(sum(expr(
          "cents * shiftleft(cast(1 as bigint), cast(day - mn as int))"))
          .as("decayed_score"))
        .orderBy(col("decayed_score").desc, col("user_id"))
        .limit(20)
    },

    // Cumulative distinct count per event ("how many distinct event types
    // has this user produced so far"): no engine supports DISTINCT inside
    // a running frame, so the scalable rewrite flags each (user, type)'s
    // FIRST occurrence (rank-1 over a finer partition) and running-sums
    // the flags. The oracle is the naive correlated subquery — quadratic
    // per user, which is exactly what the rewrite avoids.
    Q("q190_running_distinct",
      """SELECT e.user_id, e.event_id,
        |  (SELECT count(DISTINCT e2.event_type) FROM events e2
        |   WHERE e2.user_id = e.user_id
        |     AND (e2.ts < e.ts OR (e2.ts = e.ts AND e2.event_id <= e.event_id)))
        |    AS n_types
        |FROM events e ORDER BY e.user_id, e.event_id""".stripMargin) { (s, d) =>
      val firstSeen = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val running = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("__new", when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
        .withColumn("n_types", sum("__new").over(running))
        .select("user_id", "event_id", "n_types")
        .orderBy("user_id", "event_id")
    },

    // Funnel ∘ percentile composition: exact time-to-convert quartiles
    // (signup → purchase, stages in order) per signup-week cohort, through
    // the two-narrow-shuffle percentile machinery. Integer micros end to
    // end; the oracle rebuilds the funnel chain and uses DuckDB's own
    // quantile_disc (the q124-proven percentile_disc parity).
    Q("q199_time_to_convert",
      """WITH s1 AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) OVER w AS st1
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING)),
        | s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND st1 IS NOT NULL
        |                     THEN epoch_us(ts) END) OVER w AS st2
        |  FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND st2 IS NOT NULL
        |                     THEN epoch_us(ts) END) OVER w AS st3
        |  FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | s4 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND st3 IS NOT NULL
        |                     THEN epoch_us(ts) END) OVER w AS st4
        |  FROM s3 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                       ROWS UNBOUNDED PRECEDING)),
        | per_user AS (
        |  SELECT user_id, min(st1) AS st1, min(st4) AS st4
        |  FROM s4 GROUP BY 1),
        | conv AS (
        |  SELECT st1 // 604800000000 AS cohort_week, st4 - st1 AS ttc_us
        |  FROM per_user WHERE st4 IS NOT NULL)
        |SELECT cohort_week, count(*) AS n_rows,
        |  quantile_disc(ttc_us, 0.25) AS p25, quantile_disc(ttc_us, 0.50) AS p50,
        |  quantile_disc(ttc_us, 0.75) AS p75, quantile_disc(ttc_us, 0.90) AS p90
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val f = funnelStages(Tables.events(s, d),
        Seq("signup", "view", "click", "purchase"))
      val conv = f.filter(col("st4").isNotNull)
        .select(expr("st1 div 604800000000").as("cohort_week"),
          (col("st4") - col("st1")).as("ttc_us"))
      graft.scale.Sampling.exactPercentilesByKey(conv, "cohort_week", "ttc_us",
          Seq(("p25", 25, 100), ("p50", 50, 100), ("p75", 75, 100), ("p90", 90, 100)))
        .orderBy("cohort_week")
    },

    // Market-basket association rules over co-ordered parts: support ≥ 2,
    // confidence and lift as EXACT integer basis points (cross-multiplied,
    // no float ratios). Pair generation is per-order bounded (≤ C(16,2))
    // like q165's co-supplier graph — linear in lineitem, never quadratic
    // in the catalog. Top 20 by support with a total tie order.
    Q("q177_market_basket",
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        | n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
        | item AS (SELECT pk, count(*) AS sup FROM op GROUP BY 1),
        | pair AS (
        |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS sup_pair
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT p1, p2, sup_pair,
        |  sup_pair * 10000 // i1.sup AS conf12_bp,
        |  sup_pair * 10000 // i2.sup AS conf21_bp,
        |  sup_pair * n_orders * 10000 // (i1.sup * i2.sup) AS lift_bp
        |FROM pair JOIN item i1 ON i1.pk = p1 JOIN item i2 ON i2.pk = p2
        |CROSS JOIN n
        |ORDER BY sup_pair DESC, p1, p2 LIMIT 20""".stripMargin) { (s, d) =>
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val nOrders = op.select(countDistinct("ok").as("n_orders"))
      val item = op.groupBy("pk").agg(count(lit(1)).as("sup"))
      val pair = op.as("a").join(op.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("sup_pair"))
        .filter(col("sup_pair") >= 2)
      pair
        .join(item.select(col("pk").as("p1"), col("sup").as("sup1")), "p1")
        .join(item.select(col("pk").as("p2"), col("sup").as("sup2")), "p2")
        .crossJoin(broadcast(nOrders))
        .select(col("p1"), col("p2"), col("sup_pair"),
          expr("sup_pair * 10000 div sup1").as("conf12_bp"),
          expr("sup_pair * 10000 div sup2").as("conf21_bp"),
          expr("sup_pair * n_orders * 10000 div (sup1 * sup2)").as("lift_bp"))
        .orderBy(col("sup_pair").desc, col("p1"), col("p2"))
        .limit(20)
    },

    // Item-item kNN recommender ("customers also bought"): co-occurrence
    // cosine² in exact integer basis points — cooc²·10⁴ div (sup_i·sup_j)
    // cross-multiplies the square away, so the association score itself is
    // integer-certified (no sqrt). Per-item top-3 rides the TopKPerKey
    // bounded heaps: candidates ≤ k×items×mappers on the shuffle, no
    // window sort — the serving shape of a co-occurrence recommender.
    Q("q185_item_item_knn",
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        | item AS (SELECT pk, count(*) AS sup FROM op GROUP BY 1),
        | pair AS (
        |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS cooc
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        | scored AS (
        |  SELECT p1, p2, cooc,
        |    cooc * cooc * 10000 // (i1.sup * i2.sup) AS cos2_bp
        |  FROM pair JOIN item i1 ON i1.pk = p1 JOIN item i2 ON i2.pk = p2)
        |SELECT p1, p2, cooc, cos2_bp FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p1
        |    ORDER BY cos2_bp DESC, cooc DESC, p2) AS rn
        |  FROM scored)
        |WHERE rn <= 3 ORDER BY p1, cos2_bp DESC, cooc DESC, p2""".stripMargin) { (s, d) =>
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val item = op.groupBy("pk").agg(count(lit(1)).as("sup"))
      val pair = op.as("a").join(op.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("cooc"))
        .filter(col("cooc") >= 2)
      val scored = pair
        .join(item.select(col("pk").as("p1"), col("sup").as("sup1")), "p1")
        .join(item.select(col("pk").as("p2"), col("sup").as("sup2")), "p2")
        .select(col("p1"), col("p2"), col("cooc"),
          expr("cooc * cooc * 10000 div (sup1 * sup2)").as("cos2_bp"))
      graft.ops.TopK.topKPerKey(scored, Seq("p1"),
          Seq(col("cos2_bp").desc, col("cooc").desc, col("p2").asc), 3)
        .select("p1", "p2", "cooc", "cos2_bp")
        .orderBy(col("p1"), col("cos2_bp").desc, col("cooc").desc, col("p2"))
    },

    // Trailing-7-day distinct actives per day ("rolling MAU"): engines
    // can't put DISTINCT inside a sliding frame, so the scalable rewrite
    // expands each (user, day) to the ≤7 window-ends it serves — bounded
    // fan-out on an already-deduped relation — and counts distinct per
    // end day. The oracle is the plain inequality join.
    Q("q178_rolling_mau",
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        | days AS (SELECT DISTINCT day FROM ud)
        |SELECT d.day AS wday, count(DISTINCT u.user_id) AS mau7
        |FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val days = ud.select(col("day").as("wday")).distinct()
      ud.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("wday"))
        .join(days, "wday")
        .groupBy("wday").agg(countDistinct("user_id").as("mau7"))
        .orderBy("wday")
    },
  )
}
