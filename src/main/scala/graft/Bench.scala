package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and prints
  * per-query wall times as JSON.
  *
  * Materialization is `queryExecution.toRdd.count()` — it executes the
  * optimized physical plan as declared (a DataFrame `.count()` would wrap the
  * plan in an Aggregate and let Catalyst's EliminateSorts drop every query's
  * final ORDER BY, timing a different plan). Failures are recorded loudly in
  * a `failed` list, never as fake timings.
  *
  * Output contract: the detailed line (full query names, cold + per-rep warm)
  * comes first for humans; the LAST line is a compact {"metric",...} JSON
  * under ~1.5 KB — the driver keeps only the final ~2000 bytes of output, so
  * the parseable line must fit entirely inside that window.
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
    // Plan-shape regression guard (r12 verdict item 2): wall time alone is
    // too noisy to catch silent plan drift (q26's r12 +0.84s took a manual
    // isolated re-profile to adjudicate as suite interference). Shuffle-write
    // and spill bytes are deterministic per plan, so per-query deltas —
    // captured by a stage listener, attributed by draining the listener bus
    // around each cold run — are diffable round-over-round. Written to
    // BENCH_SHUFFLE.json (committed per round); queries whose shuffle grew
    // >25% AND >16 MiB vs the committed previous run are named in the
    // compact line's "shuffle_regressions".
    val shuffleAcc = new java.util.concurrent.atomic.AtomicLong
    val spillAcc = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          shuffleAcc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spillAcc.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // SPARK_GRAFT_ONLY=q26,q27 filters to matching query names (iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.registry.filter(q =>
      only.forall(_.exists(q.name.startsWith)))
    // Each query runs cold once (plan + codegen + footer reads + execution —
    // keeps cross-round comparability), then `warmReps` more times with the
    // median reported as the warm number: single warm runs on a shared VM
    // showed up to 5x run-to-run spread (q32: 0.93s vs 4.8s across r3 runs),
    // so round-over-round warm deltas need a robust statistic. r19: 3 → 2
    // warm reps — two consecutive driver benches died at the wall clock
    // (rc=124, r17+r18) because the suite left no margin for the measured
    // ~1.5x co-tenant load multiplier; the third back-to-back rep bought
    // little (back-to-back reps share any contention phase anyway — the r10
    // adjudication), while the baseline-relative recheck below restores the
    // distant re-sample exactly where a deviation needs one.
    val warmReps = sys.env.get("SPARK_GRAFT_WARM_REPS").map(_.toInt).getOrElse(2)
    def timeOne(q: graft.core.Q): Option[Double] =
      try {
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).queryExecution.toRdd.count()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} FAILED: ${e.getMessage}")
          None
      }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0d
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // The committed previous round's warm medians, read BEFORE this run
    // overwrites the artifact: the recheck gate below compares against them
    // (r18 ADVICE — intra-run spread alone misses a sustained contention
    // phase that inflates all back-to-back reps uniformly).
    val prevMed: Map[String, Double] = {
      val f = new java.io.File("BENCH_DETAIL.json")
      if (!f.exists) Map.empty
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        val prevSf = "\"sf\":([0-9.]+)".r.findFirstMatchIn(txt).map(_.group(1))
        val sfHere = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1))
        if (prevSf != sfHere) Map.empty
        else "\"([^\"]+)\":\\{\"cold\":[^}]*\"med\":([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    // Wall-clock-kill insurance (r18 verdict task 1): two driver benches in
    // a row hit rc=124 with NO parsed artifact because the only parseable
    // line prints at the very end. A compact partial line every 20 queries
    // keeps the driver's 2000-byte stdout tail parseable at any kill point —
    // headline totals + progress, no per-query map (bounded size).
    def partialLine(done: Int, coldSum: Double, warmSum: Double): String =
      s"""{"metric":"total","value":${f"$warmSum%.3f"},"unit":"sec","total_cold":${f"$coldSum%.3f"},"reps":$warmReps,"partial":{"done":$done,"of":${selected.size}},"failed":${failed.size},"sf_dir":"$sfDir"}"""
    // Byte attribution pays ONE listener-bus flush per query, not two:
    // the snapshot window covers the query's cold run AND its warm reps
    // (identical plans → identical bytes), closed by a single flush whose
    // delta divides by the execution count. The previous query's closing
    // flush doubles as this one's opening snapshot. Bracketing every cold
    // run with its own flush pair cost ~0.3s × 299 of pure wall — part of
    // what pushed the r17 driver bench past its budget. EXCEPTION (r18
    // ADVICE): a cold run that BUILT a FixtureCache entry pays one-time
    // fixture-materialization shuffles that are not part of the steady-state
    // plan — detected via the build counter, those queries pay an extra
    // post-cold flush and attribute bytes from the warm reps only.
    org.apache.spark.GraftListenerBridge.flushListeners(spark.sparkContext)
    var partialCold = 0d
    var partialWarm = 0d
    val firstPass = selected.zipWithIndex.map { case (q, qi) =>
      val (s0, p0) = (shuffleAcc.get, spillAcc.get)
      val builds0 = graft.core.FixtureCache.buildCount
      val cold = timeOne(q)
      if (cold.isEmpty) failed += q.name
      val snapped = graft.core.FixtureCache.buildCount != builds0 &&
        cold.isDefined && warmReps > 0
      val (s1, p1) =
        if (snapped) {
          org.apache.spark.GraftListenerBridge.flushListeners(spark.sparkContext)
          (shuffleAcc.get, spillAcc.get)
        } else (s0, p0)
      val warms = if (cold.isDefined) (1 to warmReps).flatMap(_ => timeOne(q)) else Nil
      org.apache.spark.GraftListenerBridge.flushListeners(spark.sparkContext)
      val execs =
        if (snapped) warms.size
        else (if (cold.isDefined) 1 else 0) + warms.size
      val div = math.max(execs, 1).toLong
      partialCold += cold.getOrElse(0d)
      partialWarm += (if (warms.nonEmpty) median(warms) else cold.getOrElse(0d))
      if ((qi + 1) % 20 == 0 && qi + 1 < selected.size)
        println(partialLine(qi + 1, partialCold, partialWarm))
      (q.name, cold, warms,
        ((shuffleAcc.get - s1) / div, (spillAcc.get - p1) / div))
    }
    // Contention guard (r10 adjudication): the r10 suite reported q50 at
    // 6.49s warm while the same suite re-run reports 1.75s and an isolated
    // profile 1.79s — a transient co-tenant load phase on the shared VM
    // inflated every rep of whatever queries ran inside it (GC logs cleared
    // the JVM itself: no full GCs, <1 GiB live in an 8 GiB heap). Since the
    // three warm reps run back-to-back, one contention phase poisons all of
    // them; re-measuring the slowest queries AT THE END of the suite gives
    // each a second, temporally distant sample and the median over all reps
    // discards whichever half saw the noise.
    val recheckN = sys.env.get("SPARK_GRAFT_RECHECK").map(_.toInt).getOrElse(8)
    val queryBytes = firstPass.map { case (name, _, _, b) => name -> b }
    // r18: recheck only queries whose OWN rep spread shows contamination
    // (max/min > 1.3) — a slow query whose back-to-back reps agree
    // was measured cleanly, and re-running it ×3 at the end of the suite
    // was ~250s of wall on the top-8 alone (the r17 budget breaker). A
    // poisoned contention phase inflates the spread of whatever ran inside
    // it, so the trigger fires exactly when the distant re-sample helps.
    // r19 (r18 ADVICE): ALSO fire when the warm median exceeds 1.5x the
    // committed previous round's — a sustained contention phase inflates
    // every back-to-back rep uniformly (spread ~1.0, median 2x wrong), and
    // only a baseline deviation exposes it. Genuine regressions re-measure
    // the same both times; poisoned ones recover at the distant re-sample.
    val slowest = firstPass.filter { case (name, _, ws, _) =>
        ws.nonEmpty && ws.min > 0 &&
          (ws.max / ws.min > 1.3 ||
            prevMed.get(name).exists(p => p > 0 && median(ws) > p * 1.5)) }
      .sortBy { case (_, _, ws, _) => -median(ws) }.take(recheckN).map(_._1).toSet
    val results = firstPass.map {
      case (name, cold, ws, _) if slowest.contains(name) && warmReps > 0 =>
        val q = selected.find(_.name == name).get
        (name, cold, ws ++ (1 to warmReps).flatMap(_ => timeOne(q)))
      case (name, cold, ws, _) => (name, cold, ws)
    }
    def fmt(v: Double) = f"$v%.3f"
    def jsonMap(entries: Seq[(String, String)]) =
      entries.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val qs = jsonMap(results.flatMap { case (k, cold, _) => cold.map(k -> _).map { case (k, v) => k -> fmt(v) } })
    val qsWarm = jsonMap(results.filter(_._3.nonEmpty)
      .map { case (k, _, ws) => k -> fmt(median(ws)) })
    val qsWarmAll = jsonMap(results.filter(_._3.nonEmpty)
      .map { case (k, _, ws) => k -> ws.map(fmt).mkString("[", ",", "]") })
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    // per-query fallback to cold where no warm reps exist (WARM_REPS=0, or
    // a rep-time failure) — without it the primary metric degrades to 0
    // while the per-query map falls back, an internally inconsistent line
    val totalWarm = results
      .flatMap { case (_, cold, ws) => if (ws.nonEmpty) Some(median(ws)) else cold }.sum
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    // Shuffle/spill bytes: compare against the committed previous run (same
    // sf only — bytes scale with the corpus), then overwrite the artifact.
    // A filtered SPARK_GRAFT_ONLY run still compares but never overwrites —
    // it would otherwise truncate the baseline to the filtered subset.
    val shuffleFile = new java.io.File("BENCH_SHUFFLE.json")
    def mb(b: Long): Double = math.round(b / 1048.576) / 1000.0
    val prev: Map[String, Double] =
      if (!shuffleFile.exists) Map.empty
      else {
        val txt = new String(java.nio.file.Files.readAllBytes(shuffleFile.toPath), "UTF-8")
        val prevSf = "\"sf\":([0-9.]+)".r.findFirstMatchIn(txt).map(_.group(1))
        if (!prevSf.contains(sfNum)) Map.empty
        else "\"([^\"]+)\":\\{\"shuffle_mb\":([0-9.]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    val shuffleRegressions = queryBytes.collect {
      case (name, (s, _)) if prev.get(name).exists(p => mb(s) > p * 1.25 && mb(s) - p > 16) =>
        name
    }
    if (only.isEmpty) {
      val body = queryBytes.map { case (name, (s, p)) =>
        s""""$name":{"shuffle_mb":${mb(s)},"spill_mb":${mb(p)}}"""
      }.mkString(",")
      val w = new java.io.PrintWriter(shuffleFile, "UTF-8")
      try w.println(s"""{"sf":$sfNum,"queries":{$body}}""") finally w.close()
    }
    // Reproducibility artifact (r14 verdict item 7): driver-vs-builder
    // deltas like r14's unexplained q80/q81 8x must be adjudicable from the
    // round's artifacts alone. The compact line can't carry per-query
    // spreads inside its 2000-byte tail budget, so the full rep series
    // (cold + every warm rep + min/median/max) lands in BENCH_DETAIL.json —
    // committed per round exactly like BENCH_SHUFFLE.json. A query whose
    // max/min rep ratio is large in the DRIVER's artifact but whose code
    // didn't change is suite noise by the artifact's own testimony; no
    // isolated re-measure session needed.
    if (only.isEmpty) {
      val body = results.map { case (name, cold, ws) =>
        val series = ws.map(fmt).mkString("[", ",", "]")
        val stats =
          if (ws.isEmpty) ""
          else s""","min":${fmt(ws.min)},"med":${fmt(median(ws))},"max":${fmt(ws.max)}"""
        s""""$name":{"cold":${cold.map(fmt).getOrElse("null")},"reps":$series$stats}"""
      }.mkString(",")
      val w = new java.io.PrintWriter(new java.io.File("BENCH_DETAIL.json"), "UTF-8")
      try w.println(s"""{"sf":$sfNum,"warm_reps_cfg":$warmReps,"queries":{$body}}""")
      finally w.close()
    }
    // suite-level spread summary for the compact line: p90 over queries of
    // the max/min warm-rep ratio — a healthy quiet run sits near 1; a run
    // poisoned by co-tenant contention phases reads well above it
    val repRatios = results.collect {
      case (_, _, ws) if ws.nonEmpty && ws.min > 0 => ws.max / ws.min
    }.sorted
    val spreadP90 =
      if (repRatios.isEmpty) 1.0
      else repRatios(math.min(repRatios.length - 1, (repRatios.length * 9) / 10))
    // detailed line: full names, cold + median warm + every warm rep (for a
    // rechecked query the series is first-pass reps ++ end-of-suite reps)
    val recheckedJson = slowest.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"detail":"full","queries":$qs,"queries_warm":$qsWarm,"warm_reps":$qsWarmAll,"rechecked":$recheckedJson,"failed":$failedJson,"sf":$sfNum,"sf_dir":"$sfDir"}""")
    // compact final line (must fit the driver's 2000-byte tail): the PRIMARY
    // numbers are the warm triple-run medians (cold-start noise made
    // round-over-round deltas unadjudicable — r9 advice item 8); cold total
    // kept as total_cold for cross-round continuity. Query keys shrink to the
    // bare qNN prefix, extended to two '_'-segments only where qNN collides
    // (q69_grouping_sets vs q69_neardup_clusters).
    val byPrefix = results.groupBy(_._1.split('_').head)
    def short(name: String) = {
      val p = name.split('_').head
      if (byPrefix(p).size == 1) p else name.split('_').take(2).mkString("_")
    }
    // 2 significant figures: at 135+ queries a fixed 2-decimal map plus
    // sbt's ~190-byte epilogue brushes the driver's 2000-byte tail window;
    // sig-figs keep relative precision (the detail line retains 3 decimals)
    // and buy ~270 bytes of headroom
    def fmt2g(v: Double) = {
      val s = f"$v%.2g"
      if (s.contains('.') && !s.contains('e')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    val shortVals = results.flatMap { case (k, cold, ws) =>
      (if (ws.nonEmpty) Some(median(ws)) else cold).map(v => (short(k), v)) }
    // shuffle_regressions names queries whose shuffle bytes grew >25% and
    // >16 MiB vs the committed BENCH_SHUFFLE.json — normally empty (zero
    // byte cost); when it fires, the names are the round's plan-drift
    // adjudication list. Capped at 8 so a pathological round can't blow the
    // tail budget on its own.
    val regJson =
      if (shuffleRegressions.isEmpty) ""
      else shuffleRegressions.take(8).map("\"" + _ + "\"")
        .mkString(""","shuffle_regressions":[""", ",", "]")
    def compactLine(entries: Seq[(String, Double)], omitted: Int) = {
      val omittedJson = if (omitted > 0) s""","omitted_fastest":$omitted""" else ""
      s"""{"metric":"total","value":${fmt(totalWarm)},"unit":"sec","total_cold":${fmt(total)},"reps":$warmReps,"spread_p90":${fmt2g(spreadP90)},"queries":${
        jsonMap(entries.map { case (k, v) => k -> fmt2g(v) })}$omittedJson$regJson,"failed":$failedJson,"sf":$sfNum}"""
    }
    // Tail-window guard: the driver parses only the final ~2000 bytes, and
    // sbt appends ~190 bytes of epilogue AFTER this line. If the full map
    // would overflow that budget, drop the FASTEST queries from the compact
    // map (explicitly counted in omitted_fastest — the detail line above
    // always carries every query), never the slow ones a reviewer grades.
    // Entries are tracked by INDEX, not short name: two queries that share a
    // short name must be keepable/droppable independently (r12 advice). If
    // even a single-entry map overflows, fall back to omitting every query —
    // the headline metric always parses.
    val full = compactLine(shortVals, 0)
    val line =
      if (full.length <= 1780) full
      else {
        val indexed = shortVals.zipWithIndex
        val bySpeed = indexed.sortBy { case ((_, v), _) => -v }
        var keep = bySpeed.length
        var candidate = full
        while (candidate.length > 1780 && keep > 0) {
          keep -= 1
          val keepIdx = bySpeed.take(keep).map(_._2).toSet
          candidate = compactLine(
            indexed.collect { case (kv, i) if keepIdx(i) => kv },
            bySpeed.length - keep)
        }
        candidate
      }
    println(line)
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
