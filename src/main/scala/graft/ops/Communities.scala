package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.CheckpointBridge

/** Label-propagation community detection — the cheap, near-linear
  * community pass (Raghavan et al. 2007) that groups a host/citation
  * graph into densely-connected regions; on corpus pipelines it is the
  * standard "same community of sites" feature next to PageRank's
  * authority and [[KCore]]'s density. [[ConnectedComponents]] answers
  * "reachable at all"; label propagation answers "densely attached",
  * which splits a connected graph into meaningful parts.
  *
  * This is the SYNCHRONOUS, deterministic variant: every node starts
  * as its own label; each round, every node simultaneously adopts the
  * label most frequent among its neighbors, ties broken to the
  * SMALLEST label; a fixed `iters` rounds (classic async LPA converges
  * faster but its result depends on visit order — useless as a
  * contract, impossible to oracle). Determinism means the unrolled SQL
  * twin ([[labelPropagationSql]]) reproduces the labels bit-for-bit.
  *
  * Scale shape: identical to [[PageRank]] — each round is one
  * edge⋈label equi-join, one (node, label)-grain count, one per-node
  * argmax window at label-candidate grain (bounded by degree, never
  * all nodes in one partition); `localCheckpoint` per generation with
  * immediate release, one generation live at a time.
  */
object Communities {

  /** @param edges undirected input, one row per edge (symmetrized
    *        internally; self-loops dropped; parallel edges count once)
    * @return (id, label) — nodes sharing a label after `iters`
    *         synchronous rounds
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters=$iters")
    val raw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = raw.union(raw.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val prev = labels
      val counts = sym
        .join(prev.select(col("id").as("__s"), col("label")),
          col("dst") === col("__s"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src"))
        .orderBy(col("__c").desc, col("label").asc)
      labels = counts
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("src").as("id"), col("label"))
        .localCheckpoint(true)
      CheckpointBridge.release(prev)
    }
    CheckpointBridge.release(sym)
    labels
  }

  /** ANSI-SQL twin of [[labelPropagation]] (unrolled CTE per round);
    * `edgesSql` must yield (src, dst). Keep in lockstep.
    */
  def labelPropagationSql(edgesSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      s"""c$i AS MATERIALIZED (
         |  SELECT e.src, l.label, count(*) AS c
         |  FROM e JOIN l${i - 1} l ON l.id = e.dst GROUP BY 1, 2
         |),
         |l$i AS MATERIALIZED (
         |  SELECT src AS id, label FROM (
         |    SELECT src, label,
         |           row_number() OVER (PARTITION BY src ORDER BY c DESC, label) AS rn
         |    FROM c$i) WHERE rn = 1
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS MATERIALIZED ($edgesSql),
       |e AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)
       |  WHERE src <> dst
       |),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM e),
       |$rounds
       |SELECT id, CAST(label AS BIGINT) AS label
       |FROM l$iters ORDER BY id""".stripMargin
  }
}
