package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-query wall-time attribution (optimization-round tooling): runs one
  * declared query under a job listener and prints every Spark job's wall
  * span plus the driver-side gaps between jobs — the fixed overhead that
  * dominates the multi-phase lifecycle queries at bench scale. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ProfileQuery q262 [reps]"
  *
  * Matches by prefix like SPARK_GRAFT_ONLY. Same session config as Bench so
  * the numbers adjudicate against BENCH_DETAIL.json medians.
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ProfileQuery <queryPrefix> [reps]"))
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_CONF="k=v;k2=v2" — extra session conf for A/B experiments
    val extra = sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.split('=')).collect { case Array(k, v) => (k, v) }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config(graft.core.Tables.NanosConfKey, "true")
      .config("spark.ui.enabled", "false")
    val spark = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    if (extra.nonEmpty) println(s"[profile] extra conf: ${extra.mkString(", ")}")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val w = spark.read.parquet(s"$sfDir/lineitem.parquet")
      w.groupBy("l_returnflag").count().queryExecution.toRdd.count()
    } catch { case _: Throwable => () }

    final case class J(id: Int, t0: Long, var t1: Long, desc: String, var stages: Int)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(s => s.nonEmpty && !s.contains("runId"))
          .getOrElse(e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct.mkString(" | "))
          .replace('\n', ' ')
        jobs.put(e.jobId, J(e.jobId, e.time, -1L, d, e.stageIds.size))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
    })

    val q = SparkEntry.registry.find(_.name.startsWith(name))
      .getOrElse(sys.error(s"no query matching $name"))
    println(s"[profile] ${q.name} sf_dir=$sfDir cpus=$cpus reps=$reps")
    var rep = 0
    while (rep <= reps) {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.flushListeners(spark.sparkContext)
      import scala.jdk.CollectionConverters._
      val js = order.asScala.toSeq.distinct.flatMap(id => Option(jobs.get(id)))
        .filter(_.t1 > 0).sortBy(_.t0)
      val inJobs = js.map(j => (j.t1 - j.t0) / 1e3).sum
      val label = if (rep == 0) "cold" else s"warm$rep"
      println(f"[profile] $label wall=$wall%.2fs jobs=${js.size} in-jobs=$inJobs%.2fs driver-gaps=${wall - inJobs}%.2fs")
      if (rep == reps) {
        // last rep: print the per-job trace with inter-job gaps
        var prevEnd = js.headOption.map(_.t0).getOrElse(0L)
        js.foreach { j =>
          val gap = (j.t0 - prevEnd) / 1e3
          if (gap > 0.005) println(f"[profile]   --gap ${gap}%.3fs--")
          println(f"[profile]   job ${j.id}%4d ${(j.t1 - j.t0) / 1e3}%7.3fs stages=${j.stages} ${j.desc.take(110)}")
          prevEnd = math.max(prevEnd, j.t1)
        }
      }
      rep += 1
    }
    spark.stop()
  }
}
