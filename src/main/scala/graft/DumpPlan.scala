package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries (optimization-round
  * evidence): writes plans/<tag>/<query>_<suffix>.txt for each query prefix.
  *
  *   sbt "runMain graft.DumpPlan r20 before q260 q262"
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlan <tag> <suffix> <queryPrefix>...")
    val (tag, suffix, prefixes) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    prefixes.foreach { p =>
      val q = SparkEntry.registry.find(_.name.startsWith(p))
        .getOrElse(sys.error(s"no query matching $p"))
      val plan = q.fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${q.name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[dumpplan] wrote plans/$tag/${q.name}_$suffix.txt (${plan.length} bytes)")
    }
    spark.stop()
  }
}
