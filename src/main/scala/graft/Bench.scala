package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and prints
  * one JSON line with per-query wall times.
  *
  * Materialization is `queryExecution.toRdd.count()` — it executes the
  * optimized physical plan as declared (a DataFrame `.count()` would wrap the
  * plan in an Aggregate and let Catalyst's EliminateSorts drop every query's
  * final ORDER BY, timing a different plan). Failures are recorded loudly in
  * a `failed` list, never as fake timings.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: bench runs local[32] unless the driver overrides
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(graft.core.Tables.NanosConfKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay JVM/codegen/parquet-footer costs before the clock
    // starts, so the first timed query isn't charged for session startup
    try {
      val w = spark.read.parquet(s"$sfDir/lineitem.parquet")
      w.groupBy("l_returnflag").count().queryExecution.toRdd.count()
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // SPARK_GRAFT_ONLY=q26,q27 filters to matching query names (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.registry.filter(q =>
      only.forall(_.exists(q.name.startsWith)))
    val results = selected.map { q =>
      val t0 = System.nanoTime()
      val ok =
        try { q.fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
            failed += q.name
            false
        }
      q.name -> (if (ok) Some((System.nanoTime() - t0) / 1e9) else None)
    }
    val qs = results.collect { case (k, Some(v)) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":$sfNum,"sf_dir":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
