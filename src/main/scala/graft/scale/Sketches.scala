package graft.scale

import graft.core.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches with DATA-deterministic state.
  *
  * The q48 note ("HLL register values are engine-specific by construction")
  * is true of library HLLs — each picks its own hash — but nothing about
  * HyperLogLog itself requires that: built over md5 (which Spark and DuckDB
  * compute identically), the register table is a pure function of the data,
  * so the driver's DuckDB gate certifies the SKETCH STATE itself value-by-
  * value, not just a rows>0 smoke. That turns the usual "trust the library"
  * sketch into an oracled operator:
  *
  *  - bucket   = first 2 hex chars of md5(key)          (m = 256 registers)
  *  - rho      = 1 + leading zero bits of the next 60 hash bits (cap 61)
  *  - register = max(rho) per bucket — a plain groupBy, so the build is one
  *    map-side-combined shuffle of (group, bucket, rho≤61) triples: O(m)
  *    state per group regardless of corpus size, and register-wise max IS
  *    the merge operator (spec-pinned law), so shards/days/streams combine
  *    without touching raw data — the property that matters at 100 TB.
  *
  * The raw HLL estimate α·m²·Σ2^(−reg) is reproduced in SQL with exact
  * integer arithmetic: Σ2^(60−reg) as DECIMAL(38,0) (bit-shift, no
  * floating-point accumulation), one double division at the end. The
  * small-range (linear-counting) correction needs ln(), whose cross-engine
  * bit-equality is not guaranteed — it lives in the Scala operator and its
  * error-bound spec, while the oracled queries certify registers + raw
  * estimate. Complements q48 (distinct-sampling estimator, O(p·D) state)
  * and approx_count_distinct (library HLL++, uncertifiable state).
  */
object Sketches {

  /** md5-derived (bucket, rho) pair for one key expression. */
  private def bucketRho(key: Column): (Column, Column) = {
    val h = md5(key.cast("string"))
    val bucket = substring(h, 1, 2)
    val rest = substring(h, 3, 15) // 60 bits
    val zeros = length(regexp_extract(rest, "^0*", 0))
    val nib = rest.substr(zeros + lit(1), lit(1))
    val nibLz = when(nib.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(nib.isin("4", "5", "6", "7"), 1)
      .when(nib.isin("2", "3"), 2)
      .otherwise(3)
    val rho = when(zeros === 15, 61).otherwise(zeros * 4 + nibLz + 1)
    (bucket, rho)
  }

  /** HLL register table for `key`, one row per (group, bucket): the sketch
    * state. Merge = groupBy(bucket).max(register) over unioned tables.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val (bucket, rho) = bucketRho(key)
    df.select(groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rho").as("register"))
  }

  /** Raw HLL estimate per group from a register table (m = 256), with the
    * exact-integer inverse-power sum exposed for certification. The
    * linear-counting corrected estimator (used when the raw estimate is
    * below 2.5m and empty buckets remain) is [[hllCorrected]].
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val sumExact = sum(expr("shiftleft(cast(1 as bigint), 60 - register)")
      .cast("decimal(38,0)"))
    val vEmpty = lit(256) - count(lit(1))
    val two60 = lit(1152921504606846976L) // 2^60, exact
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        (sumExact + vEmpty.cast("decimal(38,0)") * two60.cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("inv_sum"),
        vEmpty.cast("long").as("v_empty"))
      .withColumn("est_raw",
        round(lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(256.0) * lit(256.0) *
          pow(lit(2.0), lit(60)) / col("inv_sum").cast("double"), 2))
  }

  /** HLL++-style estimator with the small-range linear-counting branch —
    * the production operator (spec-certified error bound; ln() keeps it out
    * of the cross-engine oracle).
    */
  def hllCorrected(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    hllEstimate(registers, groupCols).withColumn("est",
      when(col("v_empty") > 0 && col("est_raw") <= 2.5 * 256,
        round(lit(256.0) * log(lit(256.0) / col("v_empty")), 2))
        .otherwise(col("est_raw")))

  private val registerSql =
    """SELECT strftime(ts, '%Y-%m') AS month, substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
      |  max(CASE WHEN length(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 15), '^0*')) = 15 THEN 61
      |      ELSE length(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 15), '^0*')) * 4
      |        + CASE WHEN substr(substr(md5(CAST(user_id AS VARCHAR)), 3, 15),
      |                           length(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 15), '^0*')) + 1, 1)
      |                    IN ('8','9','a','b','c','d','e','f') THEN 0
      |               WHEN substr(substr(md5(CAST(user_id AS VARCHAR)), 3, 15),
      |                           length(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 15), '^0*')) + 1, 1)
      |                    IN ('4','5','6','7') THEN 1
      |               WHEN substr(substr(md5(CAST(user_id AS VARCHAR)), 3, 15),
      |                           length(regexp_extract(substr(md5(CAST(user_id AS VARCHAR)), 3, 15), '^0*')) + 1, 1)
      |                    IN ('2','3') THEN 2
      |               ELSE 3 END + 1 END) AS register
      |FROM events GROUP BY 1, 2""".stripMargin

  val queries: Seq[Q] = Seq(
    // The sketch STATE, value-certified: every (month, bucket, register)
    // triple must match DuckDB's computation over the same hash.
    Q("q157_hll_registers",
      s"""SELECT month, bucket, register FROM ($registerSql) ORDER BY month, bucket""") {
      (s, d) =>
        hllRegisters(
          Tables.events(s, d).withColumn("month", date_format(col("ts"), "yyyy-MM")),
          Seq("month"), col("user_id"))
          .orderBy("month", "bucket")
    },

    // The estimator pipeline over certified registers, on a cardinality in
    // HLL's raw-estimate range (distinct l_orderkey per returnflag, ~5k-15k
    // at sf0.01 vs the m=256 sketch's ~640 small-range threshold):
    // exact-integer inverse-power sum (emitted as a string — DECIMAL(38,0)
    // crosses the parquet/duckdb boundary as different dtype families), raw
    // estimate, and measured relative error vs the exact cardinality.
    Q("q158_hll_estimate",
      s"""WITH regs AS (
         |  SELECT l_returnflag AS grp, substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) AS bucket,
         |    max(CASE WHEN length(regexp_extract(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15), '^0*')) = 15 THEN 61
         |        ELSE length(regexp_extract(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15), '^0*')) * 4
         |          + CASE WHEN substr(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15),
         |                             length(regexp_extract(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15), '^0*')) + 1, 1)
         |                      IN ('8','9','a','b','c','d','e','f') THEN 0
         |                 WHEN substr(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15),
         |                             length(regexp_extract(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15), '^0*')) + 1, 1)
         |                      IN ('4','5','6','7') THEN 1
         |                 WHEN substr(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15),
         |                             length(regexp_extract(substr(md5(CAST(l_orderkey AS VARCHAR)), 3, 15), '^0*')) + 1, 1)
         |                      IN ('2','3') THEN 2
         |                 ELSE 3 END + 1 END) AS register
         |  FROM lineitem GROUP BY 1, 2),
         |est AS (
         |  SELECT grp,
         |    CAST(sum(CAST(1::BIGINT << (60 - register) AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |      + CAST(256 - count(1) AS DECIMAL(38,0)) * CAST(1::BIGINT << 60 AS DECIMAL(38,0)) AS inv_sum,
         |    CAST(256 - count(1) AS BIGINT) AS v_empty
         |  FROM regs GROUP BY 1),
         |exact AS (SELECT l_returnflag AS grp, count(DISTINCT l_orderkey) AS exact_cnt FROM lineitem GROUP BY 1)
         |SELECT e.grp, CAST(CAST(e.inv_sum AS DECIMAL(38,0)) AS VARCHAR) AS inv_sum, e.v_empty,
         |  round(0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * pow(2.0, 60) / CAST(e.inv_sum AS DOUBLE), 2) AS est_raw,
         |  x.exact_cnt,
         |  round(abs(round(0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * pow(2.0, 60) / CAST(e.inv_sum AS DOUBLE), 2) - x.exact_cnt) / x.exact_cnt, 4) AS rel_err
         |FROM est e JOIN exact x ON e.grp = x.grp
         |ORDER BY e.grp""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).withColumnRenamed("l_returnflag", "grp")
      val regs = hllRegisters(li, Seq("grp"), col("l_orderkey"))
      val est = hllEstimate(regs, Seq("grp"))
      val exact = li.groupBy("grp").agg(countDistinct("l_orderkey").as("exact_cnt"))
      est.join(exact, "grp")
        .withColumn("rel_err", round(abs(col("est_raw") - col("exact_cnt")) / col("exact_cnt"), 4))
        .withColumn("inv_sum", col("inv_sum").cast("string"))
        .select("grp", "inv_sum", "v_empty", "est_raw", "exact_cnt", "rel_err")
        .orderBy("grp")
    },

    // Count-min sketch STATE, value-certified like q157: every
    // (hrow, bucket, cnt) counter must match DuckDB's over the same md5.
    Q("q166_cm_state",
      s"""SELECT hrow,
         |  substr(md5(CAST(hrow AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
         |  count(*) AS cnt
         |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) t(hrow)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      cmState(Tables.events(s, d), col("user_id"))
        .orderBy("hrow", "bucket")
    },

    // Heavy hitters served from the sketch: per-key min-over-rows estimate,
    // thresholded. The estimate never undercounts (spec law), so no true
    // heavy key is missed; collisions can only add false positives.
    Q("q167_cm_heavy_hitters",
      s"""WITH state AS (
         |  SELECT hrow,
         |    substr(md5(CAST(hrow AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) t(hrow)
         |  GROUP BY 1, 2),
         | cand AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS user_key FROM events),
         | probes AS (
         |  SELECT user_key, hrow,
         |    substr(md5(CAST(hrow AS VARCHAR) || ':' || user_key), 1, 2) AS bucket
         |  FROM cand CROSS JOIN (VALUES (0), (1), (2), (3)) t(hrow))
         |SELECT user_key, CAST(min(cnt) AS BIGINT) AS est
         |FROM probes JOIN state USING (hrow, bucket)
         |GROUP BY 1 HAVING min(cnt) >= 80
         |ORDER BY user_key""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      cmEstimate(cmState(events, col("user_id")),
          events.select(col("user_id")), col("user_id"))
        .filter(col("est") >= 80)
        .orderBy("user_key")
    },

    // Theta-sketch set algebra over the per-event-type audiences: state,
    // θ, retained intersection count, and BOTH estimates value-certified
    // (the only floats are two final IEEE divisions, bit-equal across
    // engines); exact intersections ride along so estimate quality is
    // itself part of the certified result.
    Q("q174_theta_sets",
      """WITH h AS (SELECT DISTINCT event_type AS g,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM events),
        | sk AS (SELECT g, h FROM (
        |    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h)
        |  WHERE rn <= 64),
        | types AS (SELECT DISTINCT g FROM sk),
        | pr AS (SELECT a.g AS g1, b.g AS g2 FROM types a JOIN types b ON a.g < b.g),
        | uh AS (SELECT DISTINCT p.g1, p.g2, s.h
        |   FROM pr p JOIN sk s ON s.g = p.g1 OR s.g = p.g2),
        | usk AS (SELECT g1, g2, h FROM (
        |    SELECT g1, g2, h, row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn FROM uh)
        |  WHERE rn <= 64),
        | th AS (SELECT g1, g2, max(h) AS theta, count(*) AS ku FROM usk GROUP BY 1, 2),
        | ib AS (SELECT u.g1, u.g2, count(*) AS c_both
        |   FROM usk u
        |   JOIN th t ON t.g1 = u.g1 AND t.g2 = u.g2
        |   JOIN sk a ON a.g = u.g1 AND a.h = u.h
        |   JOIN sk b ON b.g = u.g2 AND b.h = u.h
        |   WHERE u.h < t.theta
        |   GROUP BY 1, 2),
        | ua AS (SELECT DISTINCT event_type AS g, user_id FROM events),
        | ex AS (SELECT p.g1, p.g2, count(*) AS exact_inter
        |   FROM pr p
        |   JOIN ua a ON a.g = p.g1
        |   JOIN ua b ON b.g = p.g2 AND b.user_id = a.user_id
        |   GROUP BY 1, 2)
        |SELECT t.g1, t.g2, t.theta, t.ku,
        |  COALESCE(i.c_both, 0) AS c_both,
        |  CASE WHEN t.ku < 64 THEN CAST(t.ku AS DOUBLE)
        |       ELSE round(63.0 * 1152921504606846976.0 / t.theta, 2) END AS union_est,
        |  CASE WHEN t.ku < 64 THEN CAST(COALESCE(i.c_both, 0) AS DOUBLE)
        |       ELSE round(COALESCE(i.c_both, 0) * 1152921504606846976.0 / t.theta, 2) END AS inter_est,
        |  x.exact_inter
        |FROM th t LEFT JOIN ib i ON i.g1 = t.g1 AND i.g2 = t.g2
        |JOIN ex x ON x.g1 = t.g1 AND x.g2 = t.g2
        |ORDER BY t.g1, t.g2""".stripMargin) { (s, d) =>
      val events = Tables.events(s, d)
      val sk = thetaSketch(events, "event_type", col("user_id"))
      val ua = events.select(col("event_type").as("g1"), col("user_id")).distinct()
      val ub = events.select(col("event_type").as("g2"), col("user_id")).distinct()
      val exact = ua.join(ub, "user_id").filter(col("g1") < col("g2"))
        .groupBy("g1", "g2").agg(count(lit(1)).as("exact_inter"))
      thetaPairEstimates(sk)
        .join(exact, Seq("g1", "g2"))
        .orderBy("g1", "g2")
    },

    // The quantile sketch end to end: per-event-type p50/p90/p99 estimates
    // off the 128-row hash-bottom sample, with the EXACT percentiles (the
    // q124-proven machinery) riding along so estimate quality is itself a
    // certified value. The oracle re-derives the sample (same md5 order,
    // same ties), the integer rank arithmetic, and the exact side — one
    // row sampled differently anywhere moves an estimate and fails the
    // hash.
    Q("q209_quantile_sketch",
      """WITH r0 AS (
        |  SELECT event_type AS g,
        |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        | sk AS (SELECT g, h, v FROM (
        |   SELECT g, h, v, row_number() OVER (PARTITION BY g ORDER BY h, v) AS rn
        |   FROM (SELECT DISTINCT g, h, v FROM r0)) WHERE rn <= 128),
        | rk AS (SELECT g, h, v,
        |   row_number() OVER (PARTITION BY g ORDER BY v, h) AS rn,
        |   count(*) OVER (PARTITION BY g) AS m FROM sk),
        | est AS (SELECT g, CAST(max(m) AS BIGINT) AS n_sample,
        |   max(CASE WHEN rn = (m * 50 + 99) // 100 THEN v END) AS p50_est,
        |   max(CASE WHEN rn = (m * 90 + 99) // 100 THEN v END) AS p90_est,
        |   max(CASE WHEN rn = (m * 99 + 99) // 100 THEN v END) AS p99_est
        |   FROM rk GROUP BY 1),
        | ex AS (SELECT event_type AS g, CAST(count(1) AS BIGINT) AS n_rows,
        |   CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.50) AS BIGINT) AS p50_exact,
        |   CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.90) AS BIGINT) AS p90_exact,
        |   CAST(quantile_disc(CAST(round(value * 100) AS BIGINT), 0.99) AS BIGINT) AS p99_exact
        |   FROM events GROUP BY 1)
        |SELECT g AS event_type, n_sample, n_rows, p50_est, p90_est, p99_est,
        |  p50_exact, p90_exact, p99_exact
        |FROM est JOIN ex USING (g) ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      val sk = quantileSketch(ev, "event_type", col("event_id"), col("cents"))
      val est = quantileEstimates(sk,
        Seq(("p50_est", 50, 100), ("p90_est", 90, 100), ("p99_est", 99, 100)))
      val exact = Sampling.exactPercentilesByKey(
        ev.select(col("event_type"), col("cents")), "event_type", "cents",
        Seq(("p50_exact", 50, 100), ("p90_exact", 90, 100), ("p99_exact", 99, 100)))
      est.join(exact.withColumnRenamed("event_type", "g"), "g")
        .select(col("g").as("event_type"), col("n_sample"), col("n_rows"),
          col("p50_est"), col("p90_est"), col("p99_est"),
          col("p50_exact"), col("p90_exact"), col("p99_exact"))
        .orderBy("event_type")
    },
  )

  /** Theta (KMV) sketch: the k smallest DISTINCT md5-fraction hashes of
    * `key` per group — the third certified sketch family here, and the one
    * that closes HLL's gap: registers only union, but theta sketches
    * INTERSECT (and difference), which is how "how many users did both X
    * and Y" is answered without a distinct-pair shuffle. State is k longs
    * per group (build = distinct + bounded TopKPerKey heaps, no window
    * sort); merge = re-select k smallest over the unioned states. Hashes
    * are uniform in [0, 2^60) via the same md5-fraction idiom as q160, so
    * the whole state and every downstream estimate is engine-replayable.
    */
  def thetaSketch(df: DataFrame, groupCol: String, key: Column,
                  k: Int = 64): DataFrame =
    graft.ops.TopK.topKPerKey(
      df.select(col(groupCol).as("g"),
          conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .distinct(),
      Seq("g"), Seq(col("h").asc), k)

  /** Pairwise set-operation estimates from theta sketches: for each group
    * pair g1 < g2, θ = the k-th smallest hash of the UNION sketch, and
    *   |A∪B| ≈ (k−1)·2^60/θ,  |A∩B| ≈ c·2^60/θ
    * where c counts hashes strictly below θ present in BOTH sketches.
    * Below k distinct union hashes the sketch is exhaustive ("exact mode")
    * and the union estimate is the plain count. Everything up to the final
    * rounded IEEE division is integer — the estimates themselves oracle.
    * All relations here are sketch-sized (groups × k rows), broadcast-safe
    * no matter the corpus.
    */
  def thetaPairEstimates(sk: DataFrame, k: Int = 64): DataFrame = {
    val types = sk.select(col("g")).distinct()
    val pr = types.select(col("g").as("g1"))
      .crossJoin(types.select(col("g").as("g2")))
      .filter(col("g1") < col("g2"))
    val uh = pr
      .join(sk.select(col("g"), col("h")),
        col("g") === col("g1") || col("g") === col("g2"))
      .select("g1", "g2", "h").distinct()
    val usk = graft.ops.TopK.topKPerKey(uh, Seq("g1", "g2"), Seq(col("h").asc), k)
    val theta = usk.groupBy("g1", "g2")
      .agg(max("h").as("theta"), count(lit(1)).as("ku"))
    // strictly-below-theta retention: theta itself is in the union sketch
    // and may sit in both inputs — the estimator's retention rule excludes
    // it (one deterministic convention shared with the oracle)
    val inBoth = usk
      .join(theta.select("g1", "g2", "theta"), Seq("g1", "g2"))
      .filter(col("h") < col("theta"))
      .join(sk.select(col("g").as("g1"), col("h")), Seq("g1", "h"))
      .join(sk.select(col("g").as("g2"), col("h")), Seq("g2", "h"))
      .groupBy("g1", "g2").agg(count(lit(1)).as("c_both"))
    val two60 = 1152921504606846976.0 // 2^60
    theta.join(inBoth, Seq("g1", "g2"), "left")
      .select(col("g1"), col("g2"), col("theta"), col("ku"),
        coalesce(col("c_both"), lit(0L)).as("c_both"))
      .withColumn("union_est",
        when(col("ku") < k, col("ku").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(two60) /
            col("theta").cast("double"), 2)))
      .withColumn("inter_est",
        when(col("ku") < k, col("c_both").cast("double"))
          .otherwise(round(col("c_both").cast("double") * lit(two60) /
            col("theta").cast("double"), 2)))
  }

  /** Count-min sketch state over `key`: `depth` salted md5 hash rows × 256
    * buckets of exact counters — one map-side-combined shuffle of
    * (hrow, bucket) pairs, O(depth·256) state per sketch regardless of
    * corpus size. Merge = elementwise counter SUM over unioned states
    * (spec-pinned law), so shards/days/streams combine without raw data —
    * the same 100 TB property as the HLL registers above, for frequency
    * instead of cardinality. Estimates only ever overcount (counters absorb
    * colliding keys), so a threshold serve keeps every true heavy hitter.
    */
  def cmState(df: DataFrame, key: Column, depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth $depth out of range")
    val rows = explode(array((0 until depth).map(lit(_)): _*)).as("hrow")
    df.select(key.cast("string").as("__k"))
      .select(col("__k"), rows)
      .select(col("hrow"),
        substring(md5(concat(col("hrow").cast("string"), lit(":"), col("__k"))), 1, 2)
          .as("bucket"))
      .groupBy("hrow", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for each distinct candidate key: min over the
    * depth rows' counters. Left join + zero-fill so external candidates the
    * sketch never saw estimate 0 rather than vanish. The state side is
    * O(depth·256) rows — always broadcast.
    */
  def cmEstimate(state: DataFrame, candidates: DataFrame, key: Column,
                 depth: Int = 4): DataFrame = {
    val rows = explode(array((0 until depth).map(lit(_)): _*)).as("hrow")
    candidates.select(key.cast("string").as("user_key")).distinct()
      .select(col("user_key"), rows)
      .withColumn("bucket",
        substring(md5(concat(col("hrow").cast("string"), lit(":"), col("user_key"))), 1, 2))
      .join(broadcast(state), Seq("hrow", "bucket"), "left")
      .groupBy("user_key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Mergeable QUANTILE sketch — the missing member of the sketch family
    * (HLL counts distinct, CM counts frequency, theta does set algebra;
    * this one answers "what is p90?"). State per group: the `k` rows with
    * the SMALLEST md5(rowKey) hashes, each carrying its measured value —
    * a uniform-without-replacement k-sample that, like every sketch here,
    * is a pure function of the DATA: deterministic across runs, engines
    * and partitionings, so the driver's DuckDB gate certifies the sample
    * AND the estimates value-by-value (no library t-digest can offer
    * that). Mergeable by the KMV argument: the k smallest hashes of A∪B
    * all live in bottomK(A) ∪ bottomK(B), so merge = union + re-cut —
    * shards/days/streams combine without touching raw data (SketchesSpec
    * law; the streaming sink runs the merge continuously).
    *
    * Build cost: one map-side-combined bounded-heap pass
    * ([[graft.ops.TopK.topKPerKey]]); state O(groups·k) forever.
    * `rowKey` must be unique per row (duplicate keys collapse via the
    * distinct — which is also what makes a foreachBatch replay of the
    * merge idempotent).
    */
  def quantileSketch(df: DataFrame, groupCol: String, rowKey: Column,
                     value: Column, k: Int = 128): DataFrame =
    graft.ops.TopK.topKPerKey(
      df.select(col(groupCol).as("g"),
          conv(substring(md5(rowKey.cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"),
          value.cast("long").as("v"))
        .distinct(),
      Seq("g"), Seq(col("h").asc, col("v").asc), k)

  /** Discrete quantile estimates off the sketch: for each (name, num, den)
    * point, the ceil(m·num/den)-th smallest sample value — the
    * percentile_disc semantics [[Sampling.exactPercentilesByKey]] computes
    * exactly, applied to the m-row sample. Rank arithmetic is pure integer
    * ((m·num + den−1) div den), the relation sketch-sized throughout.
    */
  def quantileEstimates(sk: DataFrame,
                        points: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = sk
      .withColumn("__rn", row_number()
        .over(Window.partitionBy("g").orderBy(col("v").asc, col("h").asc))
        .cast("long"))
      .withColumn("__m", count(lit(1))
        .over(Window.partitionBy("g")).cast("long"))
    val aggs = max(col("__m")).as("n_sample") +:
      points.map { case (name, num, den) =>
        max(when(col("__rn") === expr(s"(__m * $num + ${den - 1}) div $den"),
          col("v"))).as(name)
      }
    ranked.groupBy("g").agg(aggs.head, aggs.tail: _*)
  }
}
