package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the md5-deterministic HLL: registers are a pure function of the
  * data (partitioning-invariant), register-wise max IS the union merge, and
  * the corrected estimator holds its error bound across three orders of
  * magnitude — including the small range the raw estimate can't serve.
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def ids(from: Int, until: Int) =
    (from until until).map(i => s"id_$i").toDF("k").withColumn("g", lit("all"))

  private def regs(df: org.apache.spark.sql.DataFrame) =
    Sketches.hllRegisters(df, Seq("g"), col("k"))
      .collect().map(r => (r.getString(1), r.getInt(2))).toMap

  test("registers are partitioning-invariant (pure function of the data)") {
    val data = ids(0, 5000)
    assert(regs(data.repartition(1)) === regs(data.repartition(17, col("k"))))
  }

  test("merge law: registers(A union B) == bucket-wise max of the shard registers") {
    val a = ids(0, 3000)
    val b = ids(2000, 6000) // overlapping shards
    val merged = Sketches.hllRegisters(a, Seq("g"), col("k"))
      .unionByName(Sketches.hllRegisters(b, Seq("g"), col("k")))
      .groupBy("g", "bucket").agg(max("register").as("register"))
      .collect().map(r => (r.getString(1), r.getInt(2))).toMap
    assert(merged === regs(a.unionByName(b)))
  }

  test("corrected estimator: within 10% at 100 / 2k / 50k distinct (m=256)") {
    for (n <- Seq(100, 2000, 50000)) {
      val est = Sketches.hllCorrected(
        Sketches.hllRegisters(ids(0, n), Seq("g"), col("k")), Seq("g"))
        .select("est").as[Double].head()
      val err = math.abs(est - n) / n
      assert(err < 0.10, s"n=$n est=$est err=$err")
    }
  }

  test("duplicates do not move the estimate (cardinality, not count)") {
    val once = ids(0, 2000)
    val thrice = once.unionByName(once).unionByName(once)
    assert(regs(once) === regs(thrice))
  }

  test("count-min: merge is elementwise counter sum over unioned states") {
    val a = ids(0, 3000)
    val b = ids(1, 2000)
    val merged = Sketches.cmState(a.unionByName(b), col("k"))
    val summed = Sketches.cmState(a, col("k")).unionByName(Sketches.cmState(b, col("k")))
      .groupBy("hrow", "bucket").agg(sum("cnt").as("cnt"))
    assert(merged.except(summed).count() === 0 && summed.except(merged).count() === 0)
  }

  test("count-min estimates never undercount, and a planted heavy key is exact-ish") {
    import spark.implicits._
    // 500 distinct light keys once each + one heavy key 400 times
    val light = (1 to 500).map(i => s"light$i")
    val data = (light ++ Seq.fill(400)("HEAVY")).toDF("k")
    val exact = data.groupBy("k").count().as[(String, Long)].collect().toMap
    val est = Sketches.cmEstimate(Sketches.cmState(data, col("k")), data, col("k"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"undercounted $k: ${est(k)} < $c")
    }
    // heavy key estimate is within the CM additive bound e*N/w ~ small here
    assert(est("HEAVY") >= 400L && est("HEAVY") <= 420L, est("HEAVY"))
  }

  test("count-min: a candidate the sketch never saw estimates zero, not missing") {
    import spark.implicits._
    val state = Sketches.cmState(Seq("a", "b", "c").toDF("k"), col("k"))
    val out = Sketches.cmEstimate(state, Seq("zzz-unseen").toDF("k"), col("k"))
      .as[(String, Long)].collect().toMap
    assert(out("zzz-unseen") === 0L)
  }

  test("theta sketch: union/intersection estimates within sampling error on planted overlap") {
    import spark.implicits._
    // |A| = 6000, |B| = 5000, |A intersect B| = 2000, |A union B| = 9000
    val a = (1 to 6000).map(i => ("A", s"id$i"))
    val b = (4001 to 9000).map(i => ("B", s"id$i"))
    val sk = Sketches.thetaSketch((a ++ b).toDF("g", "k"), "g", col("k"))
    val est = Sketches.thetaPairEstimates(sk).collect().head
    val unionEst = est.getAs[Double]("union_est")
    val interEst = est.getAs[Double]("inter_est")
    // k=64 => RSE ~ 1/sqrt(63) ~ 12.6%; 3-sigma bounds
    assert(math.abs(unionEst - 9000) / 9000 < 0.4, s"union_est $unionEst")
    assert(math.abs(interEst - 2000) / 2000 < 0.6, s"inter_est $interEst")
  }

  test("theta sketch: exact mode below k distinct; state merge = re-select k smallest") {
    import spark.implicits._
    val a = (1 to 20).map(i => ("A", s"x$i"))
    val b = (11 to 40).map(i => ("B", s"x$i"))
    val df = (a ++ b).toDF("g", "k")
    val est = Sketches.thetaPairEstimates(Sketches.thetaSketch(df, "g", col("k")))
      .collect().head
    // 40 distinct union < 64 -> exhaustive: union exact; intersection is
    // the retained common count under the same < theta rule
    assert(est.getAs[Long]("ku") === 40L)
    assert(est.getAs[Double]("union_est") === 40.0)
    // 10 common ids; the < theta retention rule may exclude one iff the
    // union's max hash happens to be common
    assert(Set(9L, 10L).contains(est.getAs[Long]("c_both")))
    // merge law: sketching the union of raw data == re-selecting the k
    // smallest from the unioned per-shard sketch states
    val big = (1 to 5000).map(i => ("G", s"id$i"))
    val shard1 = Sketches.thetaSketch(big.take(2500).toDF("g", "k"), "g", col("k"))
    val shard2 = Sketches.thetaSketch(big.drop(2500).toDF("g", "k"), "g", col("k"))
    val remerged = graft.ops.TopK.topKPerKey(
      shard1.unionByName(shard2).distinct(), Seq("g"), Seq(col("h").asc), 64)
    val direct = Sketches.thetaSketch(big.toDF("g", "k"), "g", col("k"))
    assert(remerged.except(direct).count() === 0 && direct.except(remerged).count() === 0)
  }

  test("quantile sketch: merge law, exhaustive-mode exactness, estimate within sample error") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => ("G", i.toLong, (i * 7 % 1000).toLong))
      .toDF("g", "id", "v")
    // KMV merge law: sketching the union == re-cutting the unioned shards
    val s1 = Sketches.quantileSketch(rows.filter(col("id") <= 1500), "g", col("id"), col("v"))
    val s2 = Sketches.quantileSketch(rows.filter(col("id") > 1500), "g", col("id"), col("v"))
    val remerged = graft.ops.TopK.topKPerKey(
      s1.unionByName(s2).distinct(), Seq("g"), Seq(col("h").asc, col("v").asc), 128)
    val direct = Sketches.quantileSketch(rows, "g", col("id"), col("v"))
    assert(remerged.except(direct).count() === 0 && direct.except(remerged).count() === 0)
    // below k rows the sample is exhaustive: estimates == exact percentiles
    val small = (1 to 100).map(i => ("S", i.toLong, i.toLong)).toDF("g", "id", "v")
    val est = Sketches.quantileEstimates(
        Sketches.quantileSketch(small, "g", col("id"), col("v")),
        Seq(("p50", 50, 100), ("p90", 90, 100)))
      .collect().head
    assert(est.getAs[Long]("n_sample") === 100L)
    assert(est.getAs[Long]("p50") === 50L && est.getAs[Long]("p90") === 90L)
    // sampled mode: a uniform 0..999 population's p50 estimate from a
    // 128-row uniform sample lands within ~4/sqrt(k) of 500 w.h.p. —
    // deterministic fixture, so this pins the realized value class
    val bigEst = Sketches.quantileEstimates(direct, Seq(("p50", 50, 100)))
      .collect().head
    assert(math.abs(bigEst.getAs[Long]("p50") - 500L) < 150,
      s"p50 estimate ${bigEst.getAs[Long]("p50")} implausibly far from 500")
  }
}
