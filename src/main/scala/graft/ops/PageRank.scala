package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** PageRank over an edge list — the authority signal corpus pipelines
  * weight documents by (host-graph rank is a standard pretraining
  * quality feature). Same Spark-first iteration discipline as
  * [[ConnectedComponents]]: every round is one join + one aggregation,
  * both keyed on node id; `localCheckpoint` cuts lineage per round and
  * the superseded generation's blocks are released immediately, so
  * executor memory holds ONE generation of ranks regardless of round
  * count.
  *
  * Semantics (classic damped power iteration):
  *   r'(v) = (1-d)/n + d · (Σ_{u→v} r(u)/outdeg(u) + dangling/n)
  * where `dangling` is the rank mass sitting on nodes with no
  * out-edges, redistributed uniformly — without it the ranks leak mass
  * and stop summing to 1 (asserted in the spec).
  *
  * Convergence = L1 delta below `tol` (one aggregate per round —
  * computed on the SAME frame the round materializes anyway, no extra
  * shuffle); throws past `maxIter` like the CC closures rather than
  * returning half-converged ranks.
  */
object PageRank {

  /** @param edges directed (src, dst) frame; parallel edges count once
    * @param maxIter L1 delta contracts at the DAMPING rate in the worst
    *        case (a pure 2-cycle decays exactly by `d` per round), so the
    *        budget must cover ln(tol)/ln(d) ≈ 113 rounds at the defaults
    *        — well-mixed graphs stop far earlier via the delta check
    * @return (id, rank) for every node appearing in `edges`; ranks sum
    *         to 1 up to double rounding
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            damping: Double = 0.85, maxIter: Int = 150,
            tol: Double = 1e-8): DataFrame = {
    require(damping > 0 && damping < 1, s"damping=$damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // out-degree joins against ranks every round — denormalize it onto
    // the node table once (null degree = dangling node)
    val base = nodes.join(outDeg, nodes("id") === outDeg("src"), "left")
      .select(col("id"), col("__deg"))
      .localCheckpoint(true)
    // checkpointed so each generation's plan is exactly ONE LogicalRDD
    // leaf: releasing a superseded generation must never unpersist the
    // shared `base`/`e` leaves that later rounds still read
    var ckpt = base.withColumn("rank", lit(1.0 / n)).localCheckpoint(true)
    var iter = 0
    var delta = Double.MaxValue
    while (delta > tol && iter < maxIter) {
      val prev = ckpt
      val dangling = prev.where(col("__deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = e
        .join(prev.withColumnRenamed("id", "__src2"), col("src") === col("__src2"))
        .select(col("dst"), (col("rank") / col("__deg")).as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      val next = base
        .join(contribs, base("id") === contribs("dst"), "left")
        .select(col("id"), col("__deg"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("__in"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint(true)
      delta = next.join(prev.select(col("id").as("__id2"), col("rank").as("__old")),
          col("id") === col("__id2"))
        .agg(sum(abs(col("rank") - col("__old")))).head().getDouble(0)
      CheckpointBridge.release(prev) // superseded generation — free now
      ckpt = next
      iter += 1
    }
    if (delta > tol)
      throw new IllegalStateException(
        s"PageRank did not converge within maxIter=$maxIter (L1 delta $delta" +
          s" > tol $tol) — half-converged ranks would silently misweight" +
          " documents; raise maxIter or tol")
    CheckpointBridge.release(e)
    CheckpointBridge.release(nodes)
    CheckpointBridge.release(base)
    ckpt.select(col("id"), col("rank"))
  }
}
