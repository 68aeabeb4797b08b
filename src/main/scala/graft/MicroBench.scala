package graft

import graft.core.Tables
import graft.scale.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark for the native CosineSimilarity expression vs the
  * higher-order-function fold: scores |corpus|² pairs (cross join), prints
  * one JSON line. Run: sbt "runMain graft.MicroBench".
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").cache()
    emb.count()
    val pairs = emb.select(col("embedding").as("a"))
      .crossJoin(emb.select(col("embedding").as("b")))
    def time(label: String, c: org.apache.spark.sql.Column): (String, Double, Double) = {
      // warmup then 3 timed runs, keep the best
      pairs.select(sum(c)).head()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val s = pairs.select(sum(c)).head().getDouble(0)
        ((System.nanoTime() - t0) / 1e9, s)
      }
      (label, runs.map(_._1).min, runs.head._2)
    }
    val n = emb.count()
    val native = time("native", Similarity.cosine(col("a"), col("b")))
    val hof = time("hof", Similarity.cosineHof(col("a"), col("b")))
    println(s"""{"pairs":${n * n},"native_sec":${f"${native._2}%.3f"},"hof_sec":${f"${hof._2}%.3f"},"speedup":${f"${hof._2 / native._2}%.2f"},"checksum_equal":${native._3 == hof._3}}""")
    // the same sweep over int8 codes: native fused MAC loop vs interpreted
    // fold. The double-embedding cache is dropped first so both sweeps run
    // against a comparable executor-memory state (round-9 advisory: resident
    // first-sweep pairs skewed the int8 numbers).
    val codes = Similarity.quantizeInt8(emb).select(col("vec_id"), col("qcode")).cache()
    codes.count()
    emb.unpersist(blocking = true)
    val qpairs = codes.select(col("qcode").as("a"))
      .crossJoin(codes.select(col("qcode").as("b")))
    def timeL(c: org.apache.spark.sql.Column): (Double, Long) = {
      qpairs.select(sum(c)).head()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val s = qpairs.select(sum(c)).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, s)
      }
      (runs.map(_._1).min, runs.head._2)
    }
    val qn = timeL(Similarity.int8Dot(col("a"), col("b")))
    val qh = timeL(Similarity.int8DotHof(col("a"), col("b")))
    println(s"""{"pairs":${n * n},"int8_native_sec":${f"${qn._1}%.3f"},"int8_hof_sec":${f"${qh._1}%.3f"},"speedup":${f"${qh._1 / qn._1}%.2f"},"checksum_equal":${qn._2 == qh._2}}""")
    codes.unpersist(blocking = true)
    // grid-code squared-distance sweep: the fused SqDistLong kernel vs the
    // interpreted aggregate(zip_with) fold — the q125 semDedup pair-scan
    // arithmetic, isolated.
    val grid = graft.scale.Kmeans.quantizeGrid(
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding"))
      .select(col("gcode")).cache()
    grid.count()
    val gpairs = grid.select(col("gcode").as("a"))
      .crossJoin(grid.select(col("gcode").as("b")))
    def timeG(c: org.apache.spark.sql.Column): (Double, Long) = {
      gpairs.select(sum(c)).head()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val s = gpairs.select(sum(c)).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, s)
      }
      (runs.map(_._1).min, runs.head._2)
    }
    val ncolB = org.apache.spark.sql.GraftColumnBridge.column _
    val nexprB = org.apache.spark.sql.GraftColumnBridge.expression _
    val gn = timeG(ncolB(graft.expressions.SqDistLong(nexprB(col("a")), nexprB(col("b")))))
    val gh = timeG(aggregate(
      zip_with(col("a"), col("b"), (p, q) => (p - q) * (p - q)),
      lit(0L), (acc, v) => acc + v))
    println(s"""{"pairs":${n * n},"sqdist_native_sec":${f"${gn._1}%.3f"},"sqdist_hof_sec":${f"${gh._1}%.3f"},"speedup":${f"${gh._1 / gn._1}%.2f"},"checksum_equal":${gn._2 == gh._2}}""")
    grid.unpersist(blocking = true)
    spark.stop()
  }
}
