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

  test("asofJoin keeps every left row exactly once") {
    val left = (1 to 100).map(i => ("k", ts(f"2024-01-01 10:${i % 60}%02d:00"), i)).toDF("k", "lts", "id")
    val right = Seq(("k", ts("2024-01-01 10:30:00"), "x")).toDF("k", "rts", "v")
    val out = Temporal.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
    assert(out.count() === 100)
    assert(out.select("id").distinct().count() === 100)
  }
}
