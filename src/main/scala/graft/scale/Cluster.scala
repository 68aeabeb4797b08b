package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive grouping of near-duplicate candidate pairs into clusters.
  *
  * Every near-dup generator in this engine (MinHash/SimHash/chunk-overlap/
  * embedding LSH) emits verified PAIRS; dedup survivorship needs CLUSTERS —
  * a~b and b~c must collapse to one survivor even when a~c itself was never
  * emitted (LSH miss, or the star-link cap rewired a hot bucket).
  *
  * Algorithm: min-label propagation with pointer doubling (path compression).
  * Each round does
  *
  *   label(v) := min(label(v), min over neighbours u of label(u))   — hop
  *   label(v) := min(label(v), label(label(v)))                     — double
  *
  * The hop step alone needs rounds equal to each component's eccentricity
  * from its min-id vertex (a length-d chain takes d rounds — a crash-by-
  * require at 25 in the earlier form); the doubling step halves the distance
  * to the representative each round, so convergence is O(log d) — 25 rounds
  * cover diameters past 10^7 — and the adversarial chain degrades from
  * "throws" to "two dozen cheap rounds". Every step is an equi-join + agg on
  * narrow (long, long) relations: a round shuffles O(|E|) longs and nothing
  * else; no driver-side traversal at any scale. `localCheckpoint` truncates
  * lineage each round so the plan does not grow with the iteration count,
  * and the convergence test reads the just-materialized blocks (no second
  * plan execution).
  */
object Cluster extends org.apache.spark.internal.Logging {

  /** Labels plus the convergence fact, so automation can gate on a degraded
    * (under-merged) result instead of parsing logs. `converged = false` can
    * only happen past diameter ~2^maxIters.
    */
  final case class CCResult(labels: DataFrame, converged: Boolean, iters: Int)

  /** (doc_id, cluster) for every vertex that appears in `pairs`; cluster is
    * the minimum id reachable through the pair graph. Vertices not mentioned
    * in any pair are their own singleton cluster by definition (not emitted).
    * If `maxIters` is exhausted (cannot happen below diameter ~2^maxIters),
    * the current — still valid, possibly under-merged — labels are returned
    * with a WARN log rather than an exception: a correctness query must not
    * crash on an adversarial chain. Callers that must gate on completeness
    * use [[connectedComponentsWithStatus]] and check `converged`.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
                          maxIters: Int = 25): DataFrame =
    connectedComponentsWithStatus(pairs, aCol, bCol, maxIters).labels

  /** [[connectedComponents]] with the convergence status in the result. */
  def connectedComponentsWithStatus(pairs: DataFrame, aCol: String = "doc_a",
                                    bCol: String = "doc_b",
                                    maxIters: Int = 25): CCResult = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    // lazy checkpoint + count (r21): ONE job materializes the symmetrized
    // edge blocks AND answers the empty-graph fast path (was checkpoint +
    // isEmpty — two jobs on every call, paid per micro-batch by the
    // streaming near-dup/phash sinks)
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    // empty graph: converged by definition — skip the loop's per-round jobs
    // (the streaming near-dup sink hits this on every clean crawl batch,
    // where the fixed cost of even one hop+double round is pure overhead)
    if (edges.count() == 0)
      return CCResult(edges.select(col("src").as("doc_id"), col("dst").as("cluster")),
        converged = true, iters = 0)
    // no checkpoint here: round 1's checkpoint materializes the whole chain,
    // and the two uses inside round 1 share the shuffled distinct output
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nbr"))
      val hopped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("lbl"))
      // pointer doubling: follow the new label to ITS new label. Labels are
      // always vertex ids, so the self-join hits; left join keeps roots.
      val compressed = hopped.as("u")
        .join(hopped.select(col("id").as("pid"), col("lbl").as("plbl")).as("p"),
          col("u.lbl") === col("p.pid"), "left")
        .select(col("u.id").as("id"), col("u.old").as("old"),
          least(col("u.lbl"), coalesce(col("p.plbl"), col("u.lbl"))).as("label"))
        .withColumn("__changed", col("label") =!= col("old"))
        // lazy: the convergence count below is the round's ONE job — a full
        // count (not limit(1), whose incremental execution would split the
        // materialization into several jobs) both materializes the
        // checkpoint the next round reads and answers convergence
        .localCheckpoint(false)
      converged = compressed.filter(col("__changed")).count() == 0
      labels = compressed.select("id", "label")
      it += 1
    }
    if (!converged)
      logWarning(
        s"connectedComponents: labels still moving after $maxIters rounds " +
          s"(diameter beyond 2^$maxIters?) — returning current, possibly " +
          s"under-merged labels; gate on CCResult.converged")
    CCResult(labels.select(col("id").as("doc_id"), col("label").as("cluster")),
      converged, it)
  }

  /** One row per cluster: representative (min id) + member count. */
  def clusters(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .groupBy(col("cluster").as("cluster_rep"))
      .agg(count(lit(1)).cast("long").as("cluster_size"))

  /** Drop every clustered doc except its cluster representative: the
    * transitive-closure-aware form of "drop doc_b of each near-dup pair"
    * (which is order-dependent and can leave two members of an a~b~c chain
    * alive). One anti-join on ids — docs never in any pair pass through.
    */
  def dropNearDups(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
                   aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("doc_id") =!= col("cluster"))
      .select(col("doc_id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
