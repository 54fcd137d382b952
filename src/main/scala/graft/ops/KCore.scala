package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction: the maximal subgraph in which every node has at
  * least `k` neighbors — the standard graph-density filter (spam/bot
  * rings, community kernels, "only keep well-connected entities"
  * curation). The k-core is UNIQUE, so the peeling order cannot change
  * the result — iterating "drop nodes with degree < k" converges to it
  * from any schedule. (Completes the graph family next to
  * [[ConnectedComponents]], [[PageRank]], [[Triangles]].)
  *
  * Scale shape per round: one node-grain degree aggregate and two
  * anti-joins keyed on the edge endpoints — never an adjacency collect.
  * Rounds are bounded by the longest peel chain (≤ the graph's
  * degeneracy ordering depth, in practice a handful); each round
  * `localCheckpoint`s the shrinking edge set and releases the previous
  * generation, the same discipline as the iterative closures.
  */
object KCore {

  /** Edges of the k-core (canonical `u < v` form; empty when no node
    * survives). Input edges are canonicalized first (direction,
    * duplicates, self-loops). Throws if the peel has not converged
    * within `maxIter` rounds (converge-or-throw, like [[PageRank]]).
    */
  def kCoreEdges(edges: DataFrame, src: String, dst: String, k: Int,
                 maxIter: Int = 50): DataFrame = {
    require(k >= 1, s"k=$k")
    require(maxIter >= 1, s"maxIter=$maxIter")
    var e = Triangles.canonicalEdges(edges, src, dst).localCheckpoint()
    var prev: Option[DataFrame] = None
    var iter = 0
    while (true) {
      // low is materialized once (localCheckpoint is eager) and feeds
      // BOTH the convergence probe and the two anti-joins — without
      // it each consumer would recompute the degree aggregate
      val low = Triangles.degrees(e)
        .where(col("deg") < k).select("node").localCheckpoint()
      if (low.isEmpty) {
        low.unpersist()
        prev.foreach(_.unpersist())
        return e
      }
      // convergence is checked BEFORE the budget: a peel that settles
      // on exactly the maxIter-th round must return, not throw
      if (iter >= maxIter) {
        throw new IllegalStateException(
          s"kCoreEdges: no convergence in $maxIter rounds — raise maxIter")
      }
      val next = e
        .join(low.withColumnRenamed("node", "u"), Seq("u"), "left_anti")
        .join(low.withColumnRenamed("node", "v"), Seq("v"), "left_anti")
        .select(col("u"), col("v"))
        .localCheckpoint()
      low.unpersist()
      prev.foreach(_.unpersist()) // release the pre-previous generation
      prev = Some(e)
      e = next
      iter += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Nodes of the k-core with their within-core degree. */
  def kCoreNodes(edges: DataFrame, src: String, dst: String, k: Int,
                 maxIter: Int = 50): DataFrame =
    Triangles.degrees(kCoreEdges(edges, src, dst, k, maxIter))
      .withColumnRenamed("deg", "core_deg")
}
