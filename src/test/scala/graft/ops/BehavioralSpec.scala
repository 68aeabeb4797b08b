package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class BehavioralSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String, Long)*) =
    rows.map { case (u, t, e, id) => (id, ts(t), u, e) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("funnelStages: stages must occur in order; out-of-order doesn't count") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, "2024-01-01 09:00:00", "signup", 10L),
      (1L, "2024-01-01 09:05:00", "view", 11L),
      (1L, "2024-01-01 09:10:00", "click", 12L),
      (1L, "2024-01-01 09:15:00", "purchase", 13L),
      // user 2: purchase BEFORE click -> purchase stage not reached
      (2L, "2024-01-01 09:00:00", "signup", 20L),
      (2L, "2024-01-01 09:05:00", "view", 21L),
      (2L, "2024-01-01 09:06:00", "purchase", 22L),
      (2L, "2024-01-01 09:10:00", "click", 23L),
      // user 3: view before signup doesn't count; later view does
      (3L, "2024-01-01 08:00:00", "view", 30L),
      (3L, "2024-01-01 09:00:00", "signup", 31L),
      (3L, "2024-01-01 09:30:00", "view", 32L),
      // user 4: never signed up -> reaches nothing
      (4L, "2024-01-01 09:00:00", "view", 40L),
      (4L, "2024-01-01 09:05:00", "click", 41L))
    val out = Behavioral
      .funnelStages(events, Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => Option(r.get(i)).isDefined)).toMap
    assert(out(1L) === Seq(true, true, true, true))
    assert(out(2L) === Seq(true, true, true, false))
    assert(out(3L) === Seq(true, true, false, false))
    assert(out(4L) === Seq(false, false, false, false))
  }

  test("funnelStages: equal-timestamp stage entries count via event_id order (<=)") {
    // view at the exact signup timestamp but LARGER event_id: the running
    // signup min is visible at the view row, so the view qualifies
    val events = ev(
      (1L, "2024-01-01 09:00:00", "signup", 1L),
      (1L, "2024-01-01 09:00:00", "view", 2L),
      // user 2: same timestamps but view's event_id SMALLER -> view sorts
      // first, signup not yet visible -> view does not qualify
      (2L, "2024-01-01 09:00:00", "view", 3L),
      (2L, "2024-01-01 09:00:00", "signup", 4L))
    val out = Behavioral.funnelStages(events, Seq("signup", "view"))
      .collect().map(r => r.getLong(0) -> Option(r.get(2)).isDefined).toMap
    assert(out(1L) === true)
    assert(out(2L) === false)
  }

  test("funnel chain is a single shuffle: one Exchange in the whole plan") {
    val plan = Behavioral
      .funnelStages(graft.core.Tables.events(spark, sfDir),
        Seq("signup", "view", "click", "purchase"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val exchanges = plan.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*""") || l.trim.startsWith("Exchange"))
    assert(exchanges === 1,
      s"funnel should reuse one user_id partitioning, found $exchanges:\n$plan")
  }

  test("attribution: equal split in basis points, window boundaries exact") {
    // purchase at 10:00 for user 1; clicks at 09:00 (boundary, in),
    // 09:30 (in), 08:59:59 (out), 10:00:01 (after, out)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "purchase", """{"k": 0}"""),
      (1L, ts("2024-01-01 09:00:00"), 2L, "click", """{"k": 1}"""),
      (1L, ts("2024-01-01 09:30:00"), 3L, "click", """{"k": 2}"""),
      (1L, ts("2024-01-01 08:59:59"), 4L, "click", """{"k": 3}"""),
      (1L, ts("2024-01-01 10:00:01"), 5L, "click", """{"k": 4}"""),
      // user 2: 3-way split -> 3333 each, 1bp residue dropped
      (2L, ts("2024-01-01 12:00:00"), 6L, "purchase", """{"k": 0}"""),
      (2L, ts("2024-01-01 11:10:00"), 7L, "click", """{"k": 5}"""),
      (2L, ts("2024-01-01 11:20:00"), 8L, "click", """{"k": 6}"""),
      (2L, ts("2024-01-01 11:30:00"), 9L, "click", """{"k": 7}""")
    ).map { case (u, t, id, e, p) => (id, t, u, e, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "props")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
      .withColumn("start_ts", col("pts") - expr("INTERVAL 1 HOUR"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        get_json_object(col("props"), "$.k").cast("long").as("channel"))
    val credit = Temporal.rangeJoin(clicks, purchases, "user_id", "cts", "start_ts", "pts")
      .withColumn("bp", expr("10000 div (count(1) over (partition by pid))"))
      .select("channel", "bp").as[(Long, Long)].collect().toMap
    assert(credit === Map(1L -> 5000L, 2L -> 5000L,
      5L -> 3333L, 6L -> 3333L, 7L -> 3333L))
  }

  test("rolling MAU expansion == brute-force sliding distinct") {
    val rnd = new scala.util.Random(5)
    val ud = (1 to 300).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(25).toLong))
      .distinct
    val df = ud.toDF("user_id", "day")
    val days = df.select(col("day").as("wday")).distinct()
    val got = df.select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("wday"))
      .join(days, "wday")
      .groupBy("wday").agg(countDistinct("user_id").as("mau7"))
      .as[(Long, Long)].collect().toMap
    val obs = ud.map(_._2).distinct
    val brute = obs.map(d =>
      d -> ud.filter { case (_, dd) => dd >= d - 6 && dd <= d }
        .map(_._1).distinct.size.toLong).toMap
    assert(got === brute)
  }

  test("windowed funnel: deadline excludes late stages; earliest in-window entry wins") {
    val gap = 3600000000L // 1 hour in micros
    val events = ev(
      // u1: all stages within the hour -> full funnel
      (1L, "2024-01-01 09:00:00", "signup", 10L),
      (1L, "2024-01-01 09:30:00", "view", 11L),
      (1L, "2024-01-01 10:00:00", "click", 12L),
      // u2: only view is 2h after signup -> view (and click) never reached
      (2L, "2024-01-01 09:00:00", "signup", 20L),
      (2L, "2024-01-01 11:00:01", "view", 21L),
      (2L, "2024-01-01 11:10:00", "click", 22L),
      // u3: late view at +2h, but an in-window view at +0:50 exists too;
      // click 1h1s after THAT view -> view reached, click not
      (3L, "2024-01-01 09:00:00", "signup", 30L),
      (3L, "2024-01-01 09:50:00", "view", 31L),
      (3L, "2024-01-01 11:00:00", "view", 32L),
      (3L, "2024-01-01 10:50:01", "click", 33L))
    val out = Behavioral
      .funnelStagesWithin(events, Seq("signup", "view", "click"), gap)
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => Option(r.get(i)).isDefined)).toMap
    assert(out(1L) === Seq(true, true, true))
    assert(out(2L) === Seq(true, false, false))
    assert(out(3L) === Seq(true, true, false))
  }

  test("market-basket invariants: pair support bounded by item supports; confidence <= 100%") {
    val out = graft.SparkEntry.queries("q177_market_basket")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val conf12 = r.getAs[Long]("conf12_bp"); val conf21 = r.getAs[Long]("conf21_bp")
      assert(conf12 >= 0 && conf12 <= 10000, r)
      assert(conf21 >= 0 && conf21 <= 10000, r)
    }
  }

  test("item-item kNN: directed pair scores are symmetric; at most 3 per item") {
    val out = graft.SparkEntry.queries("q185_item_item_knn")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"),
        r.getAs[Long]("cooc"), r.getAs[Long]("cos2_bp")))
    assert(out.nonEmpty)
    val perItem = out.groupBy(_._1).view.mapValues(_.length)
    assert(perItem.values.forall(_ <= 3))
    // cosine^2 is symmetric: when BOTH directions of a pair made their
    // item's top-3, the scores must agree exactly
    val scores = out.map(t => (t._1, t._2) -> t._4).toMap
    scores.foreach { case ((a, b), s2) =>
      scores.get((b, a)).foreach(rev => assert(rev === s2, s"($a,$b)"))
    }
  }

  test("decayed ranking: equal totals, newer activity wins") {
    import spark.implicits._
    // user 1: 100 cents on day 0; user 2: 100 cents on day 5 -> 2 ranks higher
    val daily = Seq((1L, 0L, 100L), (2L, 5L, 100L)).toDF("user_id", "day", "cents")
    val base = daily.agg(min("day").as("mn"))
    val scored = daily.crossJoin(base)
      .groupBy("user_id")
      .agg(sum(expr("cents * shiftleft(cast(1 as bigint), cast(day - mn as int))"))
        .as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(2L) > scored(1L))
    assert(scored(2L) === 100L * 32 && scored(1L) === 100L)
  }

  test("decayed ranking: trailing-60-day clamp keeps the shift under 62 bits") {
    import spark.implicits._
    // a 100-day span would shift 2^100 (wrapping mod 64 in Spark) without
    // the clamp; with it, only days > max-60 are weighted, so the ancient
    // row drops out and the shift is exactly 0 for the newest row
    val daily = Seq((1L, 0L, 700L), (2L, 100L, 100L)).toDF("user_id", "day", "cents")
    val horizon = daily.agg(max("day").as("mx"))
    val recent = daily.crossJoin(horizon)
      .filter(col("day") > col("mx") - lit(60)).drop("mx")
    val base = recent.agg(min("day").as("mn"))
    val scored = recent.crossJoin(base)
      .groupBy("user_id")
      .agg(sum(expr("cents * shiftleft(cast(1 as bigint), cast(day - mn as int))"))
        .as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored === Map(2L -> 100L))
  }
}
