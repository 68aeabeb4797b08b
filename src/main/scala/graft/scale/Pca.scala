package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-direction extraction over the embedding corpus — the whitening /
  * rotation primitive an embedding pipeline reaches for before quantization
  * (an OPQ-style rotation starts from exactly this basis), kept
  * integer-exact end to end so the whole trajectory replays on any engine.
  *
  * Shape: TWO corpus scans, both reducing through the native
  * [[graft.expressions.VecSumLong]] aggregate with map-side partials —
  * scan 1 yields (n, Σg) for the integer mean, scan 2 sums the centered
  * outer products into the 64×64 scatter matrix (a 4096-long vector per
  * task on the shuffle, never the vectors). The covariance (scatter DIV n —
  * truncating division, which Scala, Spark and DuckDB all share, negatives
  * included) is metadata-sized; power iteration then runs driver-side on
  * that 64×64 matrix, renormalizing each round to max |component| = 1000 in
  * integer arithmetic. Every number the query emits is a BIGINT.
  *
  * Overflow discipline: grid codes ≤ 2¹⁰ ⇒ scatter entries ≤ n·2²⁰ (div n
  * bounds covariance entries by 2²⁰ at ANY corpus size); iteration vectors
  * are ≤ 10³, so a matrix·vector term is ≤ 64·2²⁰·10³ ≈ 2³⁶ and the
  * Rayleigh numerator ≤ 64²·10³·2²⁰·10³ ≈ 2⁵² — all far inside long range
  * precisely BECAUSE the covariance normalizes before iterating.
  */
object Pca {

  private def ncol = org.apache.spark.sql.GraftColumnBridge.column _
  private def nexpr = org.apache.spark.sql.GraftColumnBridge.expression _
  private def vecSum(c: Column) =
    ncol(graft.expressions.VecSumLong(nexpr(c)).toAggregateExpression())

  /** (n, integer mean, covariance matrix) of a grid-code relation
    * (`gcode` array<bigint> column). Two scans, k·dim² driver state.
    */
  def covariance(g: DataFrame): (Long, Array[Long], Array[Array[Long]]) = {
    val r1 = g.agg(count(lit(1)).as("n"), vecSum(col("gcode")).as("s")).collect()(0)
    val n = r1.getLong(0)
    require(n > 0, "covariance of an empty corpus")
    val mu = r1.getSeq[Long](1).map(_ / n).toArray
    val dim = mu.length
    val centered = zip_with(col("gcode"),
      array(mu.map(lit(_)): _*), (a, b) => a - b)
    val outer = flatten(transform(col("__c"), x =>
      transform(col("__c"), y => x * y)))
    val r2 = g.withColumn("__c", centered)
      .select(outer.as("__o"))
      .agg(vecSum(col("__o")).as("s")).collect()(0)
    val flat = r2.getSeq[Long](0)
    (n, mu, Array.tabulate(dim, dim)((i, j) => flat(i * dim + j) / n))
  }

  /** Power iteration on the (metadata-sized) covariance: `iters` rounds of
    * multiply + integer renormalization to max |component| = 1000, then the
    * integer Rayleigh quotient — the dominant eigenvalue estimate in the
    * same fixed-point units.
    */
  def topDirection(cov: Array[Array[Long]], iters: Int = 4): (Array[Long], Long) = {
    val dim = cov.length
    var v = Array.fill(dim)(1000L)
    for (_ <- 0 until iters) {
      val w = cov.map(row => {
        var acc = 0L; var j = 0
        while (j < dim) { acc += row(j) * v(j); j += 1 }
        acc
      })
      val mx = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => x * 1000L / mx)
    }
    var num = 0L
    for (i <- 0 until dim; j <- 0 until dim) num += v(i) * cov(i)(j) * v(j)
    val den = v.map(x => x * x).sum
    (v, num / math.max(den, 1L))
  }

  private val Iters = 4

  private def iterSql(i: Int): String = {
    val p = i - 1
    s"""w$i AS (SELECT s.i, CAST(SUM(s.s * v.x) AS BIGINT) AS w
       |        FROM s JOIN v$p v ON v.i = s.j GROUP BY 1),
       |m$i AS (SELECT GREATEST(MAX(abs(w)), 1) AS mx FROM w$i),
       |v$i AS (SELECT i, w * 1000 // mx AS x FROM w$i CROSS JOIN m$i)""".stripMargin
  }

  // Oracle: mean, centered covariance (truncating // n — DuckDB, Spark and
  // Scala all truncate toward zero, negatives included), the unrolled
  // power iteration, and the Rayleigh quotient, all over the same grid ints.
  private val q138Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x ->
       |           CAST(round(least(greatest(CAST(x AS DOUBLE), -2.0), 2.0) * 256)
       |                AS BIGINT) + 512) AS g
       |  FROM embeddings),
       | nn AS (SELECT CAST(count(1) AS BIGINT) AS n FROM e),
       | mu AS (SELECT t.i, CAST(SUM(e.g[t.i]) AS BIGINT) // MAX(nn.n) AS m
       |        FROM e CROSS JOIN nn CROSS JOIN range(1, 65) t(i) GROUP BY t.i),
       | cv AS (SELECT e.vec_id, t.i, e.g[t.i] - mu.m AS c
       |        FROM e CROSS JOIN range(1, 65) t(i) JOIN mu ON mu.i = t.i),
       | s AS (SELECT a.i AS i, b.i AS j,
       |              CAST(SUM(a.c * b.c) AS BIGINT) // MAX(nn.n) AS s
       |       FROM cv a JOIN cv b ON a.vec_id = b.vec_id CROSS JOIN nn
       |       GROUP BY 1, 2),
       | v0 AS (SELECT i, CAST(1000 AS BIGINT) AS x FROM range(1, 65) t(i)),
       |${(1 to Iters).map(iterSql).mkString(",\n")},
       | den AS (SELECT CAST(GREATEST(SUM(x * x), 1) AS BIGINT) AS d FROM v$Iters),
       | ray AS (SELECT CAST(SUM(a.x * s.s * b.x) AS BIGINT) // MAX(den.d) AS r
       |         FROM s JOIN v$Iters a ON a.i = s.i JOIN v$Iters b ON b.i = s.j
       |         CROSS JOIN den)
       |SELECT CAST(v.i AS BIGINT) AS pos, v.x AS comp, ray.r AS rayleigh
       |FROM v$Iters v CROSS JOIN ray ORDER BY pos""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q138_pca_direction", q138Sql) { (s, d) =>
      import s.implicits._
      val g = Kmeans.quantizeGrid(Tables.embeddings(s, d).select("vec_id", "embedding"))
      val (_, _, cov) = covariance(g)
      val (v, ray) = topDirection(cov, Iters)
      v.zipWithIndex
        .map { case (x, i) => (i + 1L, x, ray) }.toSeq
        .toDF("pos", "comp", "rayleigh")
        .orderBy("pos")
    },
  )
}
