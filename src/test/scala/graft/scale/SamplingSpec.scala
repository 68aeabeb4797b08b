package graft.scale

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir).select("lang", "doc_id", "n_chars")

  test("stratifiedSample: exact n per stratum, deterministic, plan uses TopKPerKeyExec not Sort") {
    val s1 = Sampling.stratifiedSample(docs, "lang", "doc_id", 5)
    val s2 = Sampling.stratifiedSample(docs.repartition(7), "lang", "doc_id", 5)
    val a = s1.select("lang", "doc_id").as[(String, Long)].collect().sorted.toSeq
    val b = s2.select("lang", "doc_id").as[(String, Long)].collect().sorted.toSeq
    assert(a === b)
    // exact per-stratum size (every fixture lang has >= 5 docs)
    val sizes = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val avail = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    for ((lang, n) <- sizes) assert(n === math.min(5L, avail(lang)))
    assert(sizes.keySet === avail.keySet)
    // window-form equality: same rows as row_number over the hash permutation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ref = docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("lang", "doc_id").as[(String, Long)].collect().sorted.toSeq
    assert(a === ref)
    // the engine's plan is the bounded-heap operator, not a window sort
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Window"))
  }

  test("exactPercentilesByKey matches a brute-force sorted-pick on every key") {
    val got = Sampling.exactPercentilesByKey(docs, "lang", "n_chars",
      Seq(("p50", 50, 100), ("p90", 90, 100), ("p99", 99, 100)))
      .select("lang", "n_rows", "p50", "p90", "p99")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    val byLang = docs.select("lang", "n_chars").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    def disc(vs: IndexedSeq[Long], num: Long, den: Long): Long = {
      val n = vs.length.toLong
      // smallest value whose 1-based rank r satisfies r*den >= num*n
      val r = ((num * n + den - 1) / den).toInt
      vs(math.max(r, 1) - 1)
    }
    for ((lang, vs) <- byLang) {
      val (n, p50, p90, p99) = got(lang)
      assert(n === vs.length.toLong)
      assert(p50 === disc(vs, 50, 100), s"p50 $lang")
      assert(p90 === disc(vs, 90, 100), s"p90 $lang")
      assert(p99 === disc(vs, 99, 100), s"p99 $lang")
    }
  }

  test("exactPercentilesByKey: degenerate strata (n=1, all-equal values)") {
    val df = Seq(("a", 7L), ("b", 3L), ("b", 3L), ("b", 3L)).toDF("k", "v")
    val got = Sampling.exactPercentilesByKey(df, "k", "v",
      Seq(("p50", 50, 100), ("p99", 99, 100)))
      .select("k", "n_rows", "p50", "p99")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got("a") === ((1L, 7L, 7L)))
    assert(got("b") === ((3L, 3L, 3L)))
  }

  test("exactPercentilesByKey: exactly one corpus-keyed exchange in the plan") {
    val got = Sampling.exactPercentilesByKey(docs, "lang", "n_chars",
      Seq(("p50", 50, 100)))
    val plan = got.queryExecution.executedPlan.toString
    // phase-1 shuffle on (key, value); the window + final agg run over the
    // distinct-value table, re-keyed by lang — corpus rows shuffle ONCE
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <= 2 hash exchanges, got $exchanges\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"phase-1 aggregate should have map-side partials\n$plan")
  }

  test("weightedSample: deterministic across partitionings, exact n per stratum") {
    import spark.implicits._
    val rows = (0 until 500).map(i => (s"g${i % 3}", i.toLong, (i % 7 + 1).toLong))
      .toDF("g", "id", "w")
    def draw(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "g", "id", "w", 10)
        .select("g", "id").as[(String, Long)].collect().toSet
    val a = draw(rows.repartition(1))
    val b = draw(rows.repartition(13, col("id")))
    assert(a === b)
    assert(a.groupBy(_._1).view.mapValues(_.size).toMap ===
      Map("g0" -> 10, "g1" -> 10, "g2" -> 10))
  }

  test("weightedSample: n >= group size returns the whole (positive-weight) group") {
    import spark.implicits._
    val rows = Seq(("g", 1L, 5L), ("g", 2L, 1L), ("g", 3L, 0L), ("g", 4L, -2L))
      .toDF("g", "id", "w")
    val got = Sampling.weightedSample(rows, "g", "id", "w", 100)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L)) // zero/negative weights excluded by A-ES domain
  }

  test("weightedSample: a dominating weight is always drawn; heavy half dominates the sample") {
    import spark.implicits._
    val rows = ((0 until 200).map(i => (s"g", i.toLong, 1L)) :+ (("g", 999L, 1000000L)))
      .toDF("g", "id", "w")
    val got = Sampling.weightedSample(rows, "g", "id", "w", 5)
      .select("id").as[Long].collect().toSet
    assert(got.contains(999L), s"w=1e6 item missing from $got")

    // heavier-by-100x items should occupy most of the sample
    val skew = (0 until 400).map(i =>
      ("g", i.toLong, if (i < 200) 100L else 1L)).toDF("g", "id", "w")
    val drawn = Sampling.weightedSample(skew, "g", "id", "w", 20)
      .select("id").as[Long].collect()
    val heavy = drawn.count(_ < 200)
    assert(heavy >= 16, s"expected >=16/20 heavy items, got $heavy")
  }

  test("histogram buckets partition the rows and respect quartile mass") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 2000).map(i => ("k", rnd.nextInt(500).toLong)).toDF("lang", "n_chars")
    val bands = Sampling.exactPercentilesByKey(df, "lang", "n_chars",
      Seq(("p25", 25, 100), ("p50", 50, 100), ("p75", 75, 100)))
      .select("lang", "p25", "p50", "p75")
    val buckets = df.join(broadcast(bands), "lang")
      .groupBy(when(col("n_chars") <= col("p25"), 0)
        .when(col("n_chars") <= col("p50"), 1)
        .when(col("n_chars") <= col("p75"), 2).otherwise(3).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(buckets.values.sum === 2000L)
    // percentile_disc boundaries: cumulative mass through bucket i reaches
    // at least the i-th quartile threshold, and (ties aside) stays near it
    val cum1 = buckets(0)
    val cum2 = buckets(0) + buckets(1)
    val cum3 = cum2 + buckets(2)
    assert(cum1 >= 500 && cum2 >= 1000 && cum3 >= 1500)
    assert(buckets.values.forall(n => n > 300 && n < 700), buckets)
  }
}
