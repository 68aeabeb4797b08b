package graft.ops

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCountSum == direct groupBy on a skewed key (exactness law)") {
    // one hot key carrying 90% of rows
    val skewed = ((1 to 9000).map(_ => ("hot", 1.5)) ++ (1 to 1000).map(i => (s"k${i % 7}", 2.0)))
      .toDF("k", "v")
    val direct = skewed.groupBy("k").agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .as[(String, Long, Double)].collect().toSet
    val salted = Scale.saltedCountSum(skewed, Seq("k"), "v", salts = 8)
      .as[(String, Long, Double)].collect().toSet
    assert(salted === direct)
  }

  test("saltedJoin == plain join, with the fact side spread over salts") {
    val fact = ((1 to 5000).map(_ => (1, "hot")) ++ (1 to 100).map(i => (i % 10 + 2, "cold")))
      .toDF("k", "tag")
    val dim = (1 to 12).map(i => (i, s"dim_$i")).toDF("k", "name")
    val plain = fact.join(dim, "k").groupBy("name").count()
      .as[(String, Long)].collect().toSet
    val salted = Scale.saltedJoin(fact, dim, "k", salts = 8).groupBy("name").count()
      .as[(String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("bucketed tables join without an Exchange (co-located join)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice")
      val lineitem = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Scale.writeBucketed(orders, "b_orders", "o_orderkey", 8)
      Scale.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // sanity: the join actually produces rows
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("approx percentiles within 1% of exact at accuracy=10000") {
    val exact = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("ps"))
      .select(col("l_returnflag"), col("ps")).as[(String, Seq[Double])].collect().toMap
    val approx = Tables.lineitem(spark, sfDir).groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)").as("ps"))
      .select(col("l_returnflag"), col("ps")).as[(String, Seq[Double])].collect().toMap
    assert(approx.keySet === exact.keySet)
    for ((k, ap) <- approx; (a, e) <- ap.zip(exact(k)))
      assert(math.abs(a - e) / e < 0.01, s"group $k: approx $a vs exact $e")
  }

  test("kmvSample is partitioning-invariant and bounded at k per group") {
    val li = Tables.lineitem(spark, sfDir)
    val key = concat(col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string"))
    def sample(df: org.apache.spark.sql.DataFrame) =
      Scale.kmvSample(df, "l_returnflag", md5(key), col("l_extendedprice"), k = 256)
        .as[(String, Double)].collect().groupBy(_._1)
        .map { case (g, vs) => g -> vs.map(_._2).sorted.toSeq }
    val a = sample(li)
    val b = sample(li.repartition(7)) // physical layout must not change the sample
    assert(a === b)
    assert(a.values.forall(_.size <= 256))
  }

  test("kmv-sample quantile estimator tracks exact within the k-sample error bound") {
    val li = Tables.lineitem(spark, sfDir)
    val key = concat(col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string"))
    val est = Scale.kmvSample(li, "l_returnflag", md5(key), col("l_extendedprice"), k = 1024)
      .groupBy("l_returnflag")
      .agg(expr("percentile(sample_value, array(0.5, 0.9))").as("ps"))
      .as[(String, Seq[Double])].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("ps"))
      .as[(String, Seq[Double])].collect().toMap
    // order-statistics error for a 1024-sample is ~1/sqrt(k) in rank space;
    // 10% relative headroom on these distributions is comfortable
    for ((g, ps) <- est; (a, e) <- ps.zip(exact(g)))
      assert(math.abs(a - e) / e < 0.10, s"group $g: sample $a vs exact $e")
  }

  test("sampled distinct-count MAU tracks exact within the 1/sqrt(pD) bound") {
    val est = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .agg((countDistinct(when(md5(col("user_id").cast("string")) < "2",
        col("user_id"))) * 8).as("mau_est"))
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(countDistinct("user_id").as("mau"))
      .as[(String, Long)].collect().toMap
    // binomial std of the estimate is ~sqrt((1-p)/(p·D)) relative (~22% at
    // D=150, p=1/8); assert 3 sigma so the law, not luck, is what's tested
    est.foreach { case (m, a) =>
      val e = exact(m)
      val bound = 3 * math.sqrt(7.0 / e) // 3·sqrt((1-p)/(p·D)), p = 1/8
      assert(math.abs(a - e).toDouble / e < math.max(bound, 0.05),
        s"month $m: est $a vs exact $e (bound $bound)")
    }
  }

  test("approx MAU is within the advertised error of exact (HLL++ rsd=0.01)") {
    val exact = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(countDistinct("user_id").as("mau"))
      .as[(String, Long)].collect().toMap
    val approx = Tables.events(spark, sfDir)
      .groupBy(date_format(col("ts"), "yyyy-MM").as("month"))
      .agg(approx_count_distinct("user_id", 0.01).as("mau"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (m, a) =>
      val e = exact(m)
      assert(math.abs(a - e).toDouble / e < 0.05, s"month $m: approx $a vs exact $e")
    }
  }
}
