package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Double, Int)]): Set[Long] =
    rows.filter { case (_, m, x) =>
      !rows.exists { case (_, m2, x2) =>
        m2 <= m && x2 >= x && (m2 < m || x2 > x)
      }
    }.map(_._1).toSet

  private def engine(df: DataFrame): Set[Long] =
    Skyline.skyline2d(df, "m", "x").select("id").as[Long].collect().toSet

  test("skyline2d == brute-force dominance on random data") {
    val rnd = new Random(7)
    val rows = (1L to 400L).map(i =>
      (i, math.floor(rnd.nextDouble() * 5000) / 100.0, rnd.nextInt(50)))
    assert(engine(rows.toDF("id", "m", "x")) === brute(rows))
  }

  test("skyline2d keeps ties at a frontier point and drops same-m losers") {
    val rows = Seq(
      (1L, 1.0, 10), // frontier
      (2L, 1.0, 10), // exact duplicate: neither strictly dominated -> kept
      (3L, 1.0, 9),  // same m, smaller x -> dominated by 1
      (4L, 2.0, 10), // same x, bigger m -> dominated by 1
      (5L, 2.0, 11)) // frontier (pays more m for more x)
    assert(engine(rows.toDF("id", "m", "x")) === Set(1L, 2L, 5L))
    assert(brute(rows) === Set(1L, 2L, 5L))
  }

  test("bucket prune is semantics-free: coarse and identity buckets agree") {
    val rnd = new Random(13)
    // values clustered inside single floor-buckets — the prune's blind spot
    // if it were (incorrectly) pruning within a bucket
    val rows = (1L to 300L).map(i =>
      (i, 10.0 + rnd.nextInt(3) + rnd.nextDouble() * 0.001, rnd.nextInt(1000)))
    val df = rows.toDF("id", "m", "x")
    val coarse = Skyline.skyline2d(df, "m", "x").select("id").as[Long].collect().toSet
    val one = Skyline.skyline2d(df, "m", "x", _ => lit(0)).select("id").as[Long].collect().toSet
    assert(coarse === one)
    assert(coarse === brute(rows))
  }

  test("frontier pull-back join is broadcast (the frontier never shuffles the corpus)") {
    val df = Tables.part(spark, sfDir).select("p_partkey", "p_retailprice", "p_size")
    val plan = Skyline.skyline2d(df, "p_retailprice", "p_size")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
