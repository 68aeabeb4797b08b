package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive grouping of near-duplicate candidate pairs into clusters.
  *
  * Every near-dup generator in this engine (MinHash/SimHash/chunk-overlap/
  * embedding LSH) emits verified PAIRS; dedup survivorship needs CLUSTERS —
  * a~b and b~c must collapse to one survivor even when a~c itself was never
  * emitted (LSH miss, or the star-link cap rewired a hot bucket). This is
  * iterative min-label propagation to fixpoint:
  *
  *   label(v) := min(label(v), min over neighbours u of label(u))
  *
  * Each round is one equi-join + one aggregation on narrow (long, long)
  * relations, so a round shuffles O(|E|) longs; rounds needed = graph
  * diameter, and near-dup graphs are unions of small cliques/stars
  * (diameter 2-3) — at 100 TB this is a handful of bounded shuffles, never
  * a driver-side traversal. `localCheckpoint` truncates the lineage each
  * round so the plan does not grow with the iteration count. (For
  * adversarially long chain graphs the doubling "large-star/small-star"
  * variant converges in O(log d) rounds; near-dup clusters do not need it.)
  */
object Cluster {

  /** (id, cluster) for every vertex that appears in `pairs`; cluster is the
    * minimum id reachable through the pair graph. Vertices not mentioned in
    * any pair are their own singleton cluster by definition (not emitted).
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "doc_a", bCol: String = "doc_b",
                          maxIters: Int = 25): DataFrame = {
    val fwd = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
    val edges = fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nbr_label"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = updated.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).limit(1).count()
      converged = changed == 0
      labels = updated
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels.select(col("id").as("doc_id"), col("label").as("cluster"))
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
