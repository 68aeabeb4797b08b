package graft.ops

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class operators: salting for skewed keys,
  * bucketed co-located joins, approximate distinct counting. These are the
  * knobs a 100 TB deployment reaches for when AQE alone isn't enough.
  */
object Scale {

  /** Salted aggregation for skewed group keys: spread each hot key over
    * `salts` sub-keys, partially aggregate, then combine. Two shuffles, but
    * the first spreads a hot key across `salts` reducers instead of melting
    * one — total shuffled volume is unchanged while the straggler disappears.
    * Use when one key holds >~1/partitions of the data and AQE's skew
    * handling can't help (it only splits join partitions, not aggregations).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int)(
      aggs: (Seq[Column], Seq[Column])): DataFrame = {
    val (partial, combine) = aggs
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted count/sum per key (the common skew case): count and sum compose
    * over partial aggregation, so the two-phase result is exact.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts)((
      Seq(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum")),
      Seq(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as(s"sum_$valueCol"))))

  /** Salted join for a skewed fact key: replicate each dimension row `salts`
    * times (one per salt), salt the fact side randomly, join on (key, salt).
    * The hot key's rows land on `salts` different reducers. Dimension
    * replication costs |dim|·salts — use for moderate dims when broadcast
    * is too large and AQE skew-split isn't kicking in.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(pmod(monotonically_increasing_id(), lit(1000003L)), lit(salts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * Exchange-free (co-located): the 100 TB pattern for repeated joins on
    * the same key (fact tables joined every run). Requires saveAsTable
    * (bucketing metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  // ---- declared queries ----------------------------------------------------

  val queries: Seq[Q] = Seq(

    // W3 v2 — append + SELECT DISTINCT * as a declared oracled query
    // (UpdateSymbol_v2.py:78): re-delivering half the rows must not grow the
    // table.
    Q("q46_append_distinct",
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        | redelivered AS (SELECT * FROM base WHERE o_orderkey % 2 = 0)
        |SELECT DISTINCT * FROM (SELECT * FROM base UNION ALL SELECT * FROM redelivered)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val redelivered = base.filter(col("o_orderkey") % 2 === 0)
      graft.write.Writers.appendDistinct(base, redelivered).orderBy("o_orderkey")
    },

    // Salted aggregation over a deliberately skewed key (events.event_type
    // has few distinct values = every key is hot). Exact equality with the
    // direct groupBy is the law; the oracle computes it directly.
    Q("q47_salted_agg",
      """SELECT event_type, count(1) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      saltedCountSum(Tables.events(s, d), Seq("event_type"), "value")
        .select(col("event_type"), col("cnt"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy("event_type")
    },

    // A1 at 100 TB — approx_count_distinct (HLL++, rsd 1%) as the documented
    // MAU scale variant, driver-certified as an error-bound invariant: the
    // engine emits the exact count (which DuckDB recomputes) alongside a
    // within-5% check on its own sketch estimate. The sketch value itself is
    // engine-specific by construction and never crosses the compare; the
    // boolean does, so an HLL regression past the bound fails the gate
    // (ScaleSpec additionally pins the observed relative error).
    Q("q48_mau_approx",
      """SELECT strftime(ts, '%Y-%m') AS month, count(DISTINCT user_id) AS mau_exact,
        | true AS approx_within_5pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
        .agg(countDistinct("user_id").as("mau_exact"),
          approx_count_distinct("user_id", 0.01).as("__approx"))
        .select(col("month"), col("mau_exact"),
          (abs(col("__approx") - col("mau_exact")).cast("double") / col("mau_exact") <= 0.05)
            .as("approx_within_5pct"))
        .orderBy("month")
    },
  )
}
