package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** From near-duplicate candidate PAIRS to duplicate CLUSTERS: connected
  * components over the pair graph by iterative min-label propagation,
  * then one keeper per component.
  *
  * Each iteration is a self-describing DataFrame job (edges ⋈ labels →
  * group-min), so it distributes like any other join/aggregate; lineage is
  * truncated with localCheckpoint every iteration to keep plans bounded.
  * Iterations needed = graph diameter, which for dedup clusters (dense
  * near-clique blobs) is small. This is the standard large-scale dedup
  * endgame: LSH gives pairs, components give groups, min(id) gives the
  * canonical keeper.
  */
object DedupClusters {

  /** Connected components of the undirected pair graph.
    * @param pairs candidate pairs, one row per edge
    * @return (id, component) — component is the smallest id reachable */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    // labels for a diameter-d graph are final after pass d but only
    // OBSERVABLY final on pass d+1 (the first no-change pass), so allow
    // maxIter+1 passes: diameter == maxIter then converges instead of
    // spuriously throwing
    while (iter < maxIter + 1 && !converged) {
      val prop = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
        .union(labels)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      val changed = prop.join(labels.withColumnRenamed("comp", "old"), "id")
        .filter(col("comp") =!= col("old")).count()
      labels = prop
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter " +
          "iterations; component labels would be incorrect. The pair graph " +
          s"has diameter > $maxIter — raise maxIter (iterations needed = " +
          "graph diameter).")
    labels
  }

  /** One keeper (min id) per duplicate cluster; ids not in any pair are
    * implicitly their own keeper and are not returned. */
  def keepers(components: DataFrame): DataFrame =
    components.groupBy(col("comp"))
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("cluster_size"))

  /** Full pipeline: ids + candidate pairs → (id, keeper) replacement map
    * for every non-keeper duplicate. */
  def replacementMap(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    comps.select(col("id"), col("comp").as("keeper"))
      .filter(col("id") =!= col("keeper"))
  }
}
