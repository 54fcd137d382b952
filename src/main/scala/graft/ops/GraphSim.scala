package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap similarity (common-neighbors / Jaccard) — the
  * classic link-prediction and entity-similarity score: two nodes are
  * alike when they point at the same things (suppliers sharing many
  * customers, documents sharing many hosts). This is the graph-side
  * analog of the shingle-overlap dedup family and uses the same scale
  * discipline: candidate pairs are generated ONLY through a shared
  * neighbor (a keyed self-join on the neighbor id), never all-pairs.
  *
  * Fanout is bounded exactly like [[graft.llm.Containment]]'s
  * frequency cap: a shared vertex with in-degree > `maxDegree`
  * contributes `deg²` candidate pairs and near-zero signal (everyone
  * shares it — the graph's stopword), so capped vertices are excluded
  * from BOTH the intersection and the union. That makes the cap part
  * of the operator's CONTRACT (scores are over the capped neighbor
  * multiset), which keeps the result deterministic and lets the SQL
  * twin replicate it bit-for-bit — the same contract choice the
  * df-capped TF-IDF join made.
  *
  * Shape: neighbor-grain self-join + pair-grain count + two broadcast
  * degree lookups. No shuffle carries more than Σ min(deg, cap)² rows.
  */
object GraphSim {

  /** Jaccard overlap of out-neighbor sets for all node pairs sharing
    * at least `minInter` (capped) neighbors.
    *
    * @param edges (src, dst) frame; parallel edges count once
    * @param maxDegree shared-neighbor in-degree cap (the contract)
    * @param minInter emit pairs with at least this many shared
    *        neighbors — the support gate that keeps noise pairs out
    * @return (id_a, id_b, inter, union, jaccard_micro) with
    *         id_a < id_b; jaccard_micro = inter·1e6 div union
    */
  def neighborJaccard(edges: DataFrame, srcCol: String, dstCol: String,
                      maxDegree: Int = 1000,
                      minInter: Long = 2L,
                      assumeDistinct: Boolean = false): DataFrame = {
    // assumeDistinct: caller certifies distinct (src, dst) — skips the
    // canonicalizing shuffle (see PageRank.ranksFixedPoint)
    val e0 = edges.select(col(srcCol).cast("long").as("node"),
      col(dstCol).cast("long").as("nbr"))
    val e = if (assumeDistinct) e0 else e0.distinct()
    // drop stopword vertices FIRST so degrees and intersections see the
    // same capped world
    val capped = e.groupBy(col("nbr")).agg(count(lit(1)).as("__indeg"))
      .where(col("__indeg") <= maxDegree)
    // the capped edge table feeds the degree aggregate and BOTH pair
    // sides — checkpointed so the cap join runs once (r13; guide §5;
    // size-adaptive storage like the fact-table checkpoints)
    val en = graft.Memos.adaptiveCheckpoint(
      e.join(capped.select(col("nbr").as("__n2")),
        col("nbr") === col("__n2")).select(col("node"), col("nbr")))
    val deg = en.groupBy(col("node")).agg(count(lit(1)).as("__deg"))
    val pairs = en.select(col("node").as("id_a"), col("nbr"))
      .join(en.select(col("node").as("id_b"), col("nbr").as("__nb")),
        col("nbr") === col("__nb") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
      .where(col("inter") >= minInter)
    pairs
      .join(deg.select(col("node").as("__a"), col("__deg").as("__da")),
        col("id_a") === col("__a"))
      .join(deg.select(col("node").as("__b"), col("__deg").as("__db")),
        col("id_b") === col("__b"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("__da") + col("__db") - col("inter")).as("union"),
        expr("(inter * 1000000L) div (__da + __db - inter)")
          .as("jaccard_micro"))
  }

  /** ANSI-SQL twin of [[neighborJaccard]]; `edgesSql` must yield
    * (src, dst). Keep in lockstep.
    */
  def neighborJaccardSql(edgesSql: String, maxDegree: Int = 1000,
                         minInter: Long = 2L): String =
    s"""WITH e0 AS (SELECT DISTINCT src AS node, dst AS nbr FROM ($edgesSql)),
       |keep AS (SELECT nbr FROM e0 GROUP BY 1
       |         HAVING count(*) <= $maxDegree),
       |e AS (SELECT e0.node, e0.nbr FROM e0 JOIN keep USING (nbr)),
       |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
       |pairs AS (
       |  SELECT a.node AS id_a, b.node AS id_b,
       |         CAST(count(*) AS BIGINT) AS inter
       |  FROM e a JOIN e b ON a.nbr = b.nbr AND a.node < b.node
       |  GROUP BY 1, 2 HAVING count(*) >= $minInter
       |)
       |SELECT p.id_a, p.id_b, p.inter,
       |       da.deg + db.deg - p.inter AS "union",
       |       (p.inter * 1000000) // (da.deg + db.deg - p.inter) AS jaccard_micro
       |FROM pairs p JOIN deg da ON da.node = p.id_a
       |JOIN deg db ON db.node = p.id_b
       |ORDER BY p.id_a, p.id_b""".stripMargin
}
