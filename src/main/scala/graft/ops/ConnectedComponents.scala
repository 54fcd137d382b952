package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by iterative min-label
  * propagation: every node's label starts as its own id and each round
  * becomes the min of its label and its neighbors' labels, until a
  * fixpoint — the label is then the component's minimum id (a canonical,
  * deterministic component key).
  *
  * Spark-first iteration shape (what GraphFrames does under the hood):
  * each round is one join + one aggregation, both keyed on node id, and
  * `localCheckpoint` cuts the lineage so plans don't grow with the
  * iteration count. Rounds needed = component diameter — for near-dup
  * clusters (small, dense) that's 2-4; the `maxIter` bound is a safety
  * rail, not the expected cost. Convergence = no label changed this
  * round (probed with a `limit(1)` existence check, not a full count).
  */
object ConnectedComponents {

  /** @param edges two-column frame of undirected edges (any orientation)
    * @return (id, component) — component = min node id reachable
    * @throws IllegalStateException if `maxIter` rounds pass without
    *         reaching the fixpoint — a silent return of half-propagated
    *         labels would hand callers (near-dup clustering, min-survivor
    *         dedup) split clusters with no signal anything went wrong
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a"))
        .agg(min(col("component")).as("nmin"))
      val updated = labels
        .join(neighborMin, col("id") === col("a"), "left")
        .select(col("id"), col("component").as("__old"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      converged = updated
        .where(col("component") =!= col("__old")).limit(1).count() == 0
      labels = updated.select(col("id"), col("component"))
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within maxIter=$maxIter " +
          "rounds; labels would be split mid-propagation — raise maxIter " +
          "(rounds needed grows with component diameter)")
    labels
  }
}
