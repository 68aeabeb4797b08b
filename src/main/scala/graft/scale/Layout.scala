package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * file-level data skipping, the `OPTIMIZE ZORDER BY` story: a corpus sorted
  * on one column skips files only for predicates on THAT column; interleaving
  * the bits of two rank-normalized columns gives every file a tight min/max
  * envelope on BOTH, so scans with a predicate on either column prune most
  * files from their footer stats alone. At 100 TB this is the difference
  * between a full scan and reading a few percent of files for the
  * second-dimension query the linear sort cannot serve. Not a reference
  * operator (the reference's warehouse has no layout control) — built as the
  * write-side companion of the partition-pruning scan paths.
  *
  * Everything is integer arithmetic, deterministic on any engine: columns
  * normalize to 16-bit ranks by linear min/max scaling with INTEGER division
  * (`(x - min) * 65535 DIV (max - min)`), the two ranks interleave with the
  * classic magic-number bit spread, and a file/bucket id is the z-value's
  * top bits (`z * nBuckets DIV 2^32`) — a contiguous range of the space-
  * filling curve per bucket. Min/max come from one 1-row aggregation
  * (bounded driver collect, embedded as plan literals); no sampling, unlike
  * range-partitioner-based z-ordering, so layout is reproducible run to run.
  *
  * Scale shape: assignment is a pure codegen'd projection (shifts, masks,
  * integer divides on builtins); the only movement is the final
  * `repartition(bucket)` — one shuffle, which a layout rewrite pays by
  * definition. Skew: bucket ids are equi-width slices of the z-curve, so a
  * value-dense region concentrates rows — pair with AQE coalescing/splitting
  * or raise nBuckets; stats stay correct regardless.
  */
object Layout {

  /** Spread the low 16 bits of `c` to the even bit positions of a 32-bit
    * lane (Morton encode half): `abcd → 0a0b0c0d`.
    */
  private def spread16(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit ranks: a's bits land even, b's odd. */
  def zValue16(ua: Column, ub: Column): Column =
    spread16(ua).bitwiseOR(shiftleft(spread16(ub), 1))

  /** `(x - min) * 65535 DIV (max - min)` — the 16-bit rank. Integer DIV
    * keeps both engines exact; a constant column (min == max) ranks 0.
    */
  def rank16(x: Column, min: Long, max: Long): Column =
    if (max == min) lit(0L)
    else ncolDiv((x.cast("long") - lit(min)) * lit(65535L), max - min)

  // Column DIV: Spark's `/` on longs is fractional; route through the SQL
  // DIV operator for exact integer division.
  private def ncolDiv(num: Column, den: Long): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(num),
        org.apache.spark.sql.GraftColumnBridge.expression(lit(den))))

  /** Min/max of two columns in one pass (1-row bounded collect). */
  def minMax2(df: DataFrame, a: String, b: String): (Long, Long, Long, Long) = {
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** Assign every row its z-value and equi-width curve bucket (the file id
    * a layout rewrite would write it to). Pure projection.
    */
  def zBuckets(df: DataFrame, a: String, b: String, nBuckets: Int,
               zCol: String = "__z", bucketCol: String = "__bucket"): DataFrame = {
    val (minA, maxA, minB, maxB) = minMax2(df, a, b)
    val z = zValue16(rank16(col(a), minA, maxA), rank16(col(b), minB, maxB))
    df.withColumn(zCol, z)
      .withColumn(bucketCol, ncolDiv(col(zCol) * lit(nBuckets.toLong), 1L << 32))
  }

  /** The layout rewrite itself: cluster rows into z-curve buckets and order
    * within each, so a parquet write out of this frame gets one tight
    * min/max envelope per file on BOTH dimensions.
    */
  def zOrder(df: DataFrame, a: String, b: String, nBuckets: Int): DataFrame = {
    val withB = zBuckets(df, a, b, nBuckets)
    withB.repartition(nBuckets, col("__bucket"))
      .sortWithinPartitions("__z")
      .drop("__z", "__bucket")
  }

  /** Per-bucket footer stats — what a scan's pruning would consult. */
  def bucketStats(df: DataFrame, a: String, b: String, nBuckets: Int): DataFrame =
    zBuckets(df, a, b, nBuckets)
      .groupBy(col("__bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"),
        min(col(a)).as(s"min_a"), max(col(a)).as(s"max_a"),
        min(col(b)).as(s"min_b"), max(col(b)).as(s"max_b"))
      .orderBy("bucket")

  // q118: bucket stats of the z-ordered lineitem over (l_orderkey,
  // l_partkey) — the exact min/max envelopes a pruning scan would read.
  // The oracle replays rank16 / spread / interleave / bucket with the same
  // integer constants; min/max enter via a 1-row CTE where the engine
  // embeds the collected literals, so both sides see identical values.
  val queries: Seq[Q] = Seq(
    Q("q118_zorder",
      """WITH st AS (
        |  SELECT min(l_orderkey) AS mina, max(l_orderkey) AS maxa,
        |         min(l_partkey) AS minb, max(l_partkey) AS maxb
        |  FROM lineitem),
        | r AS (
        |  SELECT l_orderkey, l_partkey,
        |         ((l_orderkey - mina) * 65535) // (maxa - mina) AS ua,
        |         ((l_partkey - minb) * 65535) // (maxb - minb) AS ub
        |  FROM lineitem CROSS JOIN st),
        | s1 AS (
        |  SELECT l_orderkey, l_partkey,
        |         ((ua | (ua << 8)) & 16711935) AS a1,
        |         ((ub | (ub << 8)) & 16711935) AS b1
        |  FROM r),
        | s2 AS (
        |  SELECT l_orderkey, l_partkey,
        |         ((a1 | (a1 << 4)) & 252645135) AS a2,
        |         ((b1 | (b1 << 4)) & 252645135) AS b2
        |  FROM s1),
        | s3 AS (
        |  SELECT l_orderkey, l_partkey,
        |         ((a2 | (a2 << 2)) & 858993459) AS a3,
        |         ((b2 | (b2 << 2)) & 858993459) AS b3
        |  FROM s2),
        | s4 AS (
        |  SELECT l_orderkey, l_partkey,
        |         ((a3 | (a3 << 1)) & 1431655765) AS a4,
        |         ((b3 | (b3 << 1)) & 1431655765) AS b4
        |  FROM s3),
        | z AS (
        |  SELECT l_orderkey, l_partkey,
        |         (a4 | (b4 << 1)) AS zv
        |  FROM s4)
        |SELECT (zv * 64) // 4294967296 AS bucket,
        |       count(1) AS cnt,
        |       min(l_orderkey) AS min_a, max(l_orderkey) AS max_a,
        |       min(l_partkey) AS min_b, max(l_partkey) AS max_b
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      bucketStats(
        Tables.lineitem(s, d).select("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", nBuckets = 64)
    },
  )
}
