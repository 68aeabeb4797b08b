package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")

  test("zValue16 matches a bit-by-bit reference interleave") {
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0x1234L, 0xABCDL), (40000L, 7L))
    val out = cases.toDF("a", "b")
      .select(Layout.zValue16(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(out.toSeq === cases.map { case (a, b) => ref(a, b) })
  }

  test("zOrder is a pure re-layout: multiset of rows unchanged") {
    val out = Layout.zOrder(li, "l_orderkey", "l_partkey", nBuckets = 8)
    assert(out.columns.toSeq === li.columns.toSeq)
    assert(out.count() === li.count())
    assert(out.exceptAll(li).count() === 0)
    assert(li.exceptAll(out).count() === 0)
  }

  test("z-order buckets prune the second dimension where a linear sort cannot") {
    val n = 64
    // probe: a ~5% band on l_partkey, the dimension the linear layout ignores
    val (minB, maxB) = li.agg(min("l_partkey").cast("long"), max("l_partkey").cast("long"))
      .as[(Long, Long)].head()
    val lo = minB + (maxB - minB) * 40 / 100
    val hi = minB + (maxB - minB) * 45 / 100

    def intersecting(stats: Seq[(Long, Long)]): Int =
      stats.count { case (mn, mx) => mx >= lo && mn <= hi }

    val zStats = Layout.bucketStats(li, "l_orderkey", "l_partkey", n)
      .select(col("min_b").cast("long"), col("max_b").cast("long"))
      .as[(Long, Long)].collect().toSeq

    // linear layout: equi-width buckets of the FIRST dimension's rank
    val (minA, maxA) = li.agg(min("l_orderkey").cast("long"), max("l_orderkey").cast("long"))
      .as[(Long, Long)].head()
    val linStats = li
      .withColumn("__bucket",
        ((col("l_orderkey") - minA) * n / (maxA - minA + 1)).cast("long"))
      .groupBy("__bucket")
      .agg(min("l_partkey").cast("long").as("mn"), max("l_partkey").cast("long").as("mx"))
      .select("mn", "mx").as[(Long, Long)].collect().toSeq

    val zHit = intersecting(zStats)
    val linHit = intersecting(linStats)
    // the linear sort's files all straddle the full l_partkey range; the
    // z-order envelope must prune a strict majority of buckets
    assert(linHit === linStats.size)
    assert(zHit * 2 < zStats.size,
      s"z-order pruned too little: $zHit of ${zStats.size} buckets intersect")
  }
}
