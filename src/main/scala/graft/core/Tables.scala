package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see /root/repo/TESTDATA.md).
  *
  * All access to test data goes through here so that quirks of the generated
  * files (notably `events.ts` being parquet TIMESTAMP(NANOS), which Spark 4
  * refuses to read natively) are handled in exactly one place.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  val NanosConfKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** events.parquet is TIMESTAMP(NANOS): readable only under the legacy
    * nanosAsLong conf. Every graft session factory sets it at build time
    * (Sessions.local, Verify, Bench, the test session); this guard exists
    * solely for externally-created sessions (a harness driving SparkEntry
    * with its own SparkSession), where the alternative to setting it is a
    * hard read failure on every events query — not a cleaner plan.
    */
  private[graft] def ensureNanosConf(spark: SparkSession): Unit =
    if (!spark.conf.getOption(NanosConfKey).contains("true"))
      spark.conf.set(NanosConfKey, "true")

  /** The driver has generated `events.ts` in two shapes across rounds:
    * INT64 TIMESTAMP(NANOS) (readable only as a long under the legacy conf,
    * truncated to microseconds to match DuckDB's read of the same file) and
    * plain TIMESTAMP(MICROS) (directly readable). Adapt to whichever shape
    * the file actually has so a regeneration never breaks the loaders.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        // integer division: epoch-nanos exceed double's 2^53 exact range, so
        // `/ 1000` via double could round across a microsecond boundary and
        // diverge from DuckDB's exact truncation
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        // no-tz micros: wall values equal epoch values under the engine's
        // fixed UTC session tz, so this cast is value-preserving; TIMESTAMP
        // is required by watermarks and unix_micros/unix_seconds
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Read one table, normalizing the `events.ts` encoding (see normalizeTs). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      ensureNanosConf(spark)
      normalizeTs(spark.read.parquet(path(dir, name)))
    case _ =>
      spark.read.parquet(path(dir, name))
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** SparkSession factory with the engine's scale-oriented defaults.
  *
  * AQE is left on (runtime re-planning, skew-join splitting, partition
  * coalescing); shuffle partitions default to the local core count so tiny
  * test runs don't schedule 200 empty tasks — on a real cluster this would be
  * sized to executors × cores (or left to AQE's coalescing with a high
  * initial value).
  */
object Sessions {
  def local(threads: Int = 32, shufflePartitions: Int = 32): SparkSession =
    SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(Tables.NanosConfKey, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
