package graft.scale

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("covariance matches a driver-side brute force, truncation included") {
    val rows = Seq(
      (1L, Seq(10L, 0L, 5L)),
      (2L, Seq(0L, 10L, 5L)),
      (3L, Seq(10L, 10L, 5L)),
      (4L, Seq(0L, 0L, 5L)),
      (5L, Seq(7L, 3L, 5L)),
    )
    val g = rows.toDF("vec_id", "gcode")
    val (n, mu, cov) = Pca.covariance(g)
    assert(n === 5L)
    val data = rows.map(_._2.toArray)
    val muRef = Array.tabulate(3)(i => data.map(_(i)).sum / 5L)
    assert(mu.toSeq === muRef.toSeq)
    for (i <- 0 until 3; j <- 0 until 3) {
      val s = data.map(v => (v(i) - muRef(i)) * (v(j) - muRef(j))).sum
      assert(cov(i)(j) === s / 5L, s"($i,$j)")
    }
    // constant dimension → zero row/col
    assert(cov(2).forall(_ === 0L) && cov.forall(_(2) === 0L))
  }

  test("power iteration finds the dominant axis of a diagonal matrix") {
    val cov = Array(
      Array(100L, 0L, 0L),
      Array(0L, 5000L, 0L),
      Array(0L, 0L, 10L))
    val (v, ray) = Pca.topDirection(cov, iters = 6)
    // dominant component pinned to the renormalization unit, others decayed
    assert(math.abs(v(1)) === 1000L)
    assert(math.abs(v(0)) < 10L && math.abs(v(2)) < 10L)
    // Rayleigh estimate approaches the dominant eigenvalue
    assert(ray > 4900L && ray <= 5000L)
  }

  test("q138 output is deterministic across two full runs") {
    val q = Pca.queries.head
    val a = q.fn(spark, sfDir).collect().toSeq
    val b = q.fn(spark, sfDir).collect().toSeq
    assert(a === b)
  }
}
