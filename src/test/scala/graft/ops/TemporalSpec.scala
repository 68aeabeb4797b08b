package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right at-or-before each left; null when none") {
    val quotes = Seq( // (key, ts, price)
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:05:00"), 101.0),
      ("B", ts("2024-01-01 10:02:00"), 50.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq( // (key, ts, qty)
      ("A", ts("2024-01-01 10:00:00"), 1L), // tie: equal ts is visible (<=)
      ("A", ts("2024-01-01 10:04:59"), 2L), // between quotes -> 100.0
      ("A", ts("2024-01-01 11:00:00"), 3L), // after last -> 101.0
      ("B", ts("2024-01-01 10:00:00"), 4L), // before any quote -> null
      ("C", ts("2024-01-01 10:00:00"), 5L)  // key never quoted -> null
    ).toDF("sym", "tts", "qty")
    val out = Temporal.asofJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .select("qty", "price").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(
      1L -> Some(100.0), 2L -> Some(100.0), 3L -> Some(101.0),
      4L -> None, 5L -> None))
  }

  test("rangeJoin == naive inequality join (containment, bin boundaries)") {
    val points = (0 until 500).map(i =>
      ("k" + i % 3, ts(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"), i)).toDF("k", "pts", "id")
    val intervals = Seq(
      ("k0", ts("2024-01-01 05:30:00"), ts("2024-01-01 09:15:00"), "i1"), // spans bins
      ("k1", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:59:59"), "i2"), // within one bin
      ("k2", ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00"), "i3")  // crosses midnight
    ).toDF("k", "s", "e", "iv")
    val naive = points.join(intervals,
        points("k") === intervals("k") && col("pts") >= col("s") && col("pts") <= col("e"))
      .select("id", "iv").as[(Int, String)].collect().toSet
    val bucketed = Temporal.rangeJoin(points, intervals, "k", "pts", "s", "e")
      .select("id", "iv").as[(Int, String)].collect().toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("asofJoin ignores NULL right timestamps and rejects column collisions") {
    // a NULL-ts quote would sort nulls-first and carry its payload into
    // every trade; ASOF `<=` semantics (and the DuckDB oracle) exclude it
    val quotes = Seq(
      ("A", Option.empty[Timestamp], 999.0),
      ("A", Some(ts("2024-01-01 10:00:00")), 100.0)
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1L), // before any real quote -> null
      ("A", ts("2024-01-01 10:30:00"), 2L)
    ).toDF("sym", "tts", "qty")
    val out = Temporal.asofJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .select("qty", "price").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> None, 2L -> Some(100.0)))
    // rightCols colliding with a left column is an error, not silent clobber
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes.withColumnRenamed("price", "qty"),
        "sym", "tts", "qts", Seq("qty"))
    }
  }

  test("scd2: collapses runs, chains validity, flags the current row") {
    val facts = Seq(
      // key 1: A A B A -> three runs (the second A is a NEW run, not a merge)
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "A", ts("2024-01-02 00:00:00"), 2L),
      (1L, "B", ts("2024-01-03 00:00:00"), 3L),
      (1L, "A", ts("2024-01-05 00:00:00"), 4L),
      // key 2: single run
      (2L, "X", ts("2024-01-01 00:00:00"), 5L)
    ).toDF("k", "attr", "at", "seq")
    val out = Temporal.scd2(facts, "k", "attr", Seq("at", "seq"))
      .orderBy("k", "run_seq")
      .select("k", "run_seq", "attr", "valid_from", "valid_to", "is_current")
      .collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getInt(1), r.getString(2))).toSeq ===
      Seq((1, "A"), (2, "B"), (3, "A")))
    // each run's valid_to is the NEXT run's valid_from; last run open-ended
    assert(k1(0).getTimestamp(4) === k1(1).getTimestamp(3))
    assert(k1(1).getTimestamp(4) === k1(2).getTimestamp(3))
    assert(k1(2).isNullAt(4) && k1(2).getBoolean(5))
    assert(!k1(0).getBoolean(5) && !k1(1).getBoolean(5))
    assert(out.count(_.getLong(0) == 2L) === 1)
  }

  test("scd2: same-date flips stay distinct runs via the tiebreak column") {
    val facts = Seq(
      (1L, "A", ts("2024-01-01 00:00:00"), 1L),
      (1L, "B", ts("2024-01-01 00:00:00"), 2L), // same date, later seq
      (1L, "A", ts("2024-01-01 00:00:00"), 3L)
    ).toDF("k", "attr", "at", "seq")
    val out = Temporal.scd2(facts, "k", "attr", Seq("at", "seq"))
      .orderBy("run_seq").select("run_seq", "attr").as[(Int, String)].collect()
    assert(out.toSeq === Seq((1, "A"), (2, "B"), (3, "A")))
  }

  test("dyadic EWMA (q169 form) equals the float recurrence within 1 cent") {
    // E_n = (E_{n-1} + x_n) / 2, exact dyadic arithmetic vs float replay
    val xs = Seq(100L, 250L, 17L, 9999L, 0L, 1L, 333L, 42L)
    val df = xs.zipWithIndex.map { case (c, i) => ("g", i.toLong, c) }
      .toDF("g", "day_idx", "cents")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("day_idx")
    val out = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("term",
        expr("cents * shiftleft(cast(1 as bigint), cast(greatest(rn - 2, 0) as int))"))
      .withColumn("ewma", expr(
        "sum(term) over (partition by g order by day_idx rows unbounded preceding)" +
        " div shiftleft(cast(1 as bigint), cast(rn - 1 as int))"))
      .orderBy("day_idx").select("ewma").as[Long].collect()
    val expected = xs.tail.scanLeft(xs.head.toDouble)((e, x) => (e + x) / 2.0)
    out.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 1.0, s"got $got want $want")
    }
  }

  test("dyadic EWMA segmented restart survives a 150-day horizon without overflow") {
    // q169's production form: (rn-1) div 32 segments the cumulative sum so
    // shift+cents stays inside the 63-bit budget; each segment restarts
    // the recurrence from its first value. Replay the same segmented
    // recurrence in floats and demand ≤1-cent agreement on all 150 rows —
    // an unsegmented dyadic form would overflow the term multiply at
    // row ~50 for 4-digit cents (ANSI mode raises) and wrap past 63.
    val xs = (0 until 150).map(i => ((i * 37 + 11) % 10000).toLong)
    val df = xs.zipWithIndex.map { case (c, i) => ("g", i.toLong, c) }
      .toDF("g", "day_idx", "cents")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("day_idx")
    val out = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("segid", expr("(rn - 1) div 32"))
      .withColumn("srn", expr("((rn - 1) % 32) + 1"))
      .withColumn("term",
        expr("cents * shiftleft(cast(1 as bigint), cast(greatest(srn - 2, 0) as int))"))
      .withColumn("ewma", expr(
        "sum(term) over (partition by g, segid order by day_idx rows unbounded preceding)" +
        " div shiftleft(cast(1 as bigint), cast(srn - 1 as int))"))
      .orderBy("day_idx").select("ewma").as[Long].collect()
    val expected = xs.grouped(32).flatMap { seg =>
      seg.tail.scanLeft(seg.head.toDouble)((e, x) => (e + x) / 2.0)
    }.toSeq
    assert(out.length === 150)
    out.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 1.0, s"got $got want $want")
    }
  }

  test("asofJoin keeps every left row exactly once") {
    val left = (1 to 100).map(i => ("k", ts(f"2024-01-01 10:${i % 60}%02d:00"), i)).toDF("k", "lts", "id")
    val right = Seq(("k", ts("2024-01-01 10:30:00"), "x")).toDF("k", "rts", "v")
    val out = Temporal.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
    assert(out.count() === 100)
    assert(out.select("id").distinct().count() === 100)
  }

  test("trend sums: exact rational slope on a known line; shift-invariant") {
    // y = 7x + 50 exactly: slope_num/slope_den must reduce to 7/1 scaled
    val pts = (0L to 9L).map(x => ("g", x, 7 * x + 50))
    def sums(xs: Seq[(String, Long, Long)]) = {
      val df = xs.toDF("g", "x", "y")
      df.groupBy("g").agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select((col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
        .as[(Long, Long)].head()
    }
    val (num, den) = sums(pts)
    assert(num === 7 * den, s"$num / $den")
    // covariance/variance forms are shift-invariant: rebasing x by any
    // constant changes neither numerator nor denominator
    val shifted = pts.map { case (g, x, y) => (g, x + 9131, y) }
    assert(sums(shifted) === ((num, den)))
  }

  test("integer z-score identity: cross-multiplied flag == float z > 2 flag") {
    val rnd = new scala.util.Random(17)
    val xs = (1 to 200).map(_ => ("g", rnd.nextInt(30).toLong, (rnd.nextInt(9000) + 1000).toLong))
      .distinct.toDF("g", "day_idx", "cents")
    val daily = xs.groupBy("g", "day_idx").agg(sum("cents").as("cents"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("day_idx")
      .rangeBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
    val out = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("cents").over(w))
      .withColumn("q", sum(col("cents") * col("cents")).over(w))
      .withColumn("int_flag",
        (col("n") * col("cents") - col("s")) * (col("n") * col("cents") - col("s")) >
          lit(4L) * (col("n") * col("q") - col("s") * col("s")))
      .collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val x = r.getAs[Long]("cents").toDouble
      val s2 = r.getAs[Long]("s").toDouble
      val q2 = r.getAs[Long]("q").toDouble
      val mu = s2 / n
      val variance = q2 / n - mu * mu
      val floatFlag = (x - mu) * (x - mu) > 4.0 * variance
      assert(r.getAs[Boolean]("int_flag") === floatFlag, r)
    }
  }

  test("overlap flag (running-max form) == brute-force pairwise overlap") {
    val rnd = new scala.util.Random(23)
    val ivs = (1L to 300L).map { id =>
      val start = rnd.nextInt(1000).toLong
      (id % 7, id, start, start + 1 + rnd.nextInt(50))
    }
    val df = ivs.toDF("k", "id", "s", "e")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      .orderBy(col("s"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val got = df.withColumn("pm", max("e").over(w))
      .select(col("id"), (col("pm").isNotNull && col("s") < col("pm")).as("f"))
      .as[(Long, Boolean)].collect().toMap
    // brute force: interval overlaps some EARLIER-starting one (start order
    // with id tiebreak) iff start < that earlier interval's end
    def before(a: (Long, Long, Long, Long), b: (Long, Long, Long, Long)) =
      a._3 < b._3 || (a._3 == b._3 && a._2 < b._2)
    val brute = ivs.map { iv =>
      iv._2 -> ivs.exists(o => o._1 == iv._1 && o._2 != iv._2 &&
        before(o, iv) && iv._3 < o._4)
    }.toMap
    assert(got === brute)
    assert(brute.values.count(identity) > 0, "degenerate fixture")
  }

  test("integer interpolation: exact on a line, weighted form avoids negative division") {
    // observations on y = 100x at days 0, 4 (gap 1-3), and a DECREASING
    // segment 4 -> 8 (y 400 -> 0) to prove the nonneg weighted form
    val obs = Seq((0L, 0L), (4L, 400L), (8L, 0L)).toDF("day", "y")
    val spine = (0L to 8L).toDF("day")
    val joined = spine.join(obs, Seq("day"), "left")
    val wb = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wf = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val out = joined
      .withColumn("d0", last(when(col("y").isNotNull, col("day")), ignoreNulls = true).over(wb))
      .withColumn("y0", last(col("y"), ignoreNulls = true).over(wb))
      .withColumn("d1", first(when(col("y").isNotNull, col("day")), ignoreNulls = true).over(wf))
      .withColumn("y1", first(col("y"), ignoreNulls = true).over(wf))
      .withColumn("filled", when(col("y").isNotNull, col("y"))
        .otherwise(expr("(y0 * (d1 - day) + y1 * (day - d0)) div (d1 - d0)")))
      .orderBy("day").select("filled").as[Long].collect()
    assert(out.toSeq === Seq(0L, 100L, 200L, 300L, 400L, 300L, 200L, 100L, 0L))
  }

  test("OHLC invariants: low <= open,close <= high; volume sums to row count") {
    val out = graft.SparkEntry.queries("q194_ohlc")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val o = r.getAs[Long]("open"); val h = r.getAs[Long]("high")
      val l = r.getAs[Long]("low"); val c = r.getAs[Long]("close")
      assert(l <= o && o <= h && l <= c && c <= h, r)
    }
    val vol = out.map(_.getAs[Long]("volume")).sum
    assert(vol === graft.core.Tables.events(spark, sfDir).count())
  }
}
