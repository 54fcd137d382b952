package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication entry points: exact (fingerprint hash-groupBy),
  * near-dup via MinHash LSH ([[MinHash.dupPairs]]), SimHash distance,
  * n-gram Jaccard, and embedding-cosine near-dups.
  *
  * All shapes shuffle on a hash/bucket key — never an all-pairs cross
  * join — so they hold at 100 TB: exact dedup is one shuffle at
  * fingerprint grain; near-dup candidate generation is bounded by LSH
  * bucket/band fan-out.
  */
object Dedup {

  /** Default [[embeddingNearDups]] bucket cap. Finite BY DESIGN: the
    * naive caller must get the skew-bounded path — an uncapped hot bucket
    * is an O(n²) straggler task at corpus scale, and callers who can
    * prove their buckets small can opt out with `Int.MaxValue`.
    */
  val DefaultMaxBucketSize: Int = 10000

  /** Exact-duplicate groups: normalized-text fingerprints with >1 doc. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextStats.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .where(col("n_docs") > 1)

  /** Drop exact duplicates, keeping the lowest id per fingerprint
    * (deterministic survivor).
    */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextStats.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Drop near-duplicates: remove every document that appears as the
    * HIGHER id of a [[MinHash.dupPairs]] candidate with estimated Jaccard
    * at or above `minEstJaccard`. One anti-join against the distinct
    * dropped-id set — no iterative connected components, which makes the
    * pass conservative on chains (a≈b, b≈c with a≉c drops both b and c
    * even though b's own survivor is gone): the standard single-pass
    * trade for corpus-scale dedup, documented rather than hidden.
    */
  def dropNearDups(df: DataFrame, idCol: String, textCol: String,
                   minEstJaccard: Double = 0.5): DataFrame =
    dropNearDupsFromPairs(df, idCol, MinHash.dupPairs(df, idCol, textCol),
      minEstJaccard)

  /** [[dropNearDups]] over a pre-built [[MinHash.dupPairs]] candidate
    * table — the shared-materialization seam (a survivors + clusters +
    * splits composition over the same corpus should generate candidates
    * once; candidate generation is the expensive stage).
    */
  def dropNearDupsFromPairs(df: DataFrame, idCol: String, pairs: DataFrame,
                            minEstJaccard: Double = 0.5): DataFrame = {
    val dropped = pairs
      .where(col("est_jaccard") >= minEstJaccard)
      .select(col("id_b").as("__drop_id")).distinct()
    df.join(dropped, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** Near-duplicate CLUSTERS: connected components over the LSH candidate
    * pair graph, labeled by each cluster's minimum doc id — the exact
    * grouping [[dropNearDups]] approximates in one pass (chains a≈b≈c
    * land in one cluster here; keep `cluster_id == doc_id` for a
    * min-survivor dedup with no over-drop). Only documents appearing in
    * at least one candidate pair are returned (singletons are trivially
    * their own cluster).
    *
    * The closure defaults to
    * [[graft.ops.ConnectedComponents.componentsAlternating]] (O(log² n)
    * rounds regardless of cluster diameter) — the shape that survives
    * corpora where template chains make clusters deep. `alternating =
    * false` opts into plain min-label propagation (identical labels,
    * rounds = cluster diameter): marginally fewer jobs per round when
    * clusters are known shallow.
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      minEstJaccard: Double = 0.5,
                      alternating: Boolean = true): DataFrame =
    nearDupClustersFromPairs(MinHash.dupPairs(df, idCol, textCol),
      minEstJaccard, alternating)

  /** [[nearDupClusters]] over a pre-built [[MinHash.dupPairs]] candidate
    * table — see [[dropNearDupsFromPairs]] for the seam rationale.
    */
  def nearDupClustersFromPairs(pairs: DataFrame,
                               minEstJaccard: Double = 0.5,
                               alternating: Boolean = true): DataFrame = {
    val edges = pairs
      .where(col("est_jaccard") >= minEstJaccard)
      .select(col("id_a"), col("id_b"))
    val cc =
      if (alternating)
        graft.ops.ConnectedComponents.componentsAlternating(edges, "id_a", "id_b")
      else graft.ops.ConnectedComponents.components(edges, "id_a", "id_b")
    cc.select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  /** Drop near-duplicates EXACTLY one-survivor-per-cluster: the
    * transitive closure picks each cluster's minimum id and everything
    * else in the cluster drops. Unlike the single-pass [[dropNearDups]]
    * (which keeps every node that is never the larger end of a pair —
    * possibly SEVERAL per cluster, e.g. the edge set {(1,3),(2,3)}
    * keeps 1 and 2), this is the canonical dedup: one deterministic
    * survivor per connected component, no over-keep, no over-drop.
    * Costs the closure's O(log² n) rounds on top of candidate
    * generation — the price of exactness at corpus scale.
    */
  def dropNearDupsExact(df: DataFrame, idCol: String, textCol: String,
                        minEstJaccard: Double = 0.5): DataFrame =
    dropNearDupsExactFromPairs(df, idCol,
      MinHash.dupPairs(df, idCol, textCol), minEstJaccard)

  /** [[dropNearDupsExact]] over a pre-built [[MinHash.dupPairs]]
    * candidate table — see [[dropNearDupsFromPairs]].
    */
  def dropNearDupsExactFromPairs(df: DataFrame, idCol: String,
                                 pairs: DataFrame,
                                 minEstJaccard: Double = 0.5): DataFrame = {
    val losers = nearDupClustersFromPairs(pairs, minEstJaccard)
      .where(col("cluster_id") =!= col("doc_id"))
      .select(col("doc_id").as("__drop_id"))
    df.join(losers, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** Near-dup candidate pairs from winnowing fingerprints
    * ([[TextStats.winnowFingerprints]]): documents sharing at least
    * `minShared` selected fingerprints. Winnowing guarantees any shared
    * token span of ≥ w+k-1 tokens shares a fingerprint, so this catches
    * LOCAL overlap (quoted paragraphs, templated sections) that global
    * sketches like MinHash dilute away on long documents.
    *
    * Scale shape mirrors the LSH path: the self-join is at FINGERPRINT
    * grain — never all-pairs — and `maxDocsPerFp` drops boilerplate
    * fingerprints (site chrome, licenses) whose doc lists would
    * otherwise explode quadratically; fingerprints in a single document
    * are skipped outright (they cannot pair). Like
    * [[DefaultMaxBucketSize]], the cap is finite by default.
    */
  def winnowDupPairs(df: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, w: Int = 4, minShared: Int = 2,
                     maxDocsPerFp: Int = 1000): DataFrame =
    winnowDupPairsFromFps(
      winnowFingerprintTable(df, idCol, textCol, k, w), minShared,
      maxDocsPerFp)

  /** The materialized `(__id, fp)` winnow table — tokenize → k-gram →
    * window-min runs ONCE here (distinct, eagerly `localCheckpoint`ed so
    * the blocks free on GC), and every consumer reads the checkpointed
    * longs instead of re-running the text pipeline. A pairs + clusters +
    * funnel composition over the same corpus should build THIS once and
    * pass it to the `FromFps` variants: the text stage is the expensive
    * part (regex split + hashing per token), and each consumer that
    * rebuilds it pays it again.
    */
  def winnowFingerprintTable(df: DataFrame, idCol: String, textCol: String,
                             k: Int = 3, w: Int = 4): DataFrame =
    TextStats.winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("fp")).distinct()
      .localCheckpoint(true)

  /** [[winnowDupPairs]] over a pre-built [[winnowFingerprintTable]] —
    * the consumer half of the shared-materialization seam. The (doc,
    * fp) table feeds the frequency gate AND both self-join sides; the
    * self-join stays at FINGERPRINT grain, never all-pairs.
    */
  def winnowDupPairsFromFps(fps: DataFrame, minShared: Int = 2,
                            maxDocsPerFp: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared")
    require(maxDocsPerFp >= 2, s"maxDocsPerFp=$maxDocsPerFp")
    val keep = fps.groupBy(col("fp")).agg(count(lit(1)).as("__nd"))
      .where(col("__nd") > 1 && col("__nd") <= maxDocsPerFp)
      .select(col("fp"))
    val filtered = fps.join(keep, Seq("fp"))
    val a = filtered.select(col("fp"), col("__id").as("id_a"))
    val b = filtered.select(col("fp"), col("__id").as("id_b"))
    a.join(b, Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .where(col("n_shared_fps") >= minShared)
  }

  /** Near-dup CLUSTERS over the winnowing candidate graph — the same
    * alternating-star closure as [[nearDupClusters]], fed by
    * [[winnowDupPairs]] instead of MinHash LSH. The closure is
    * candidate-generator-agnostic: any pair stream clusters the same
    * way, so local-overlap (quoted spans) and global-similarity (LSH)
    * dedup share one transitive-grouping code path.
    */
  def winnowDupClusters(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, w: Int = 4, minShared: Int = 2,
                        maxDocsPerFp: Int = 1000): DataFrame =
    winnowDupClustersFromFps(
      winnowFingerprintTable(df, idCol, textCol, k, w), minShared,
      maxDocsPerFp)

  /** [[winnowDupClusters]] over a pre-built [[winnowFingerprintTable]]:
    * share one (doc, fp) materialization between the pairs report and
    * the cluster labels instead of tokenizing the corpus twice.
    */
  def winnowDupClustersFromFps(fps: DataFrame, minShared: Int = 2,
                               maxDocsPerFp: Int = 1000): DataFrame = {
    val edges = winnowDupPairsFromFps(fps, minShared, maxDocsPerFp)
      .select(col("id_a"), col("id_b"))
    graft.ops.ConnectedComponents.componentsAlternating(edges, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component").as("cluster_id"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    * bucketed by `bucketCol` (cluster id / [[Similarity.signBucket]]).
    *
    * `maxBucketSize` guards against bucket skew: within-bucket pairing is
    * O(n²) per bucket, so one hot label (n rows) becomes an O(n²)
    * straggler task at corpus scale. Buckets larger than the cap are
    * deterministically sub-salted into ⌈n/cap⌉ sub-buckets (hash of id)
    * and pairs are only generated within a sub-bucket — bounding every
    * task at ~cap² compares at a documented recall cost: cross-sub-bucket
    * pairs of the hot bucket are skipped (≈1-1/⌈n/cap⌉ of that bucket's
    * pairs). Results on buckets at-or-under the cap are unchanged. The
    * default cap of 10,000 bounds any single task at ~10⁸ compares —
    * minutes, not days, under one hot label; pass `Int.MaxValue` to opt
    * into exact (uncapped) within-bucket semantics, which also skips the
    * size-table join entirely.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        bucketCol: String, threshold: Double,
                        maxBucketSize: Int = Dedup.DefaultMaxBucketSize): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      col(bucketCol).as("__bucket"))
    val keyed =
      if (maxBucketSize == Int.MaxValue) base.withColumn("__sub", lit(0))
      else {
        // bucket-grain size table; the join shuffles on __bucket, the same
        // key the pair-join below shuffles on anyway
        val sizes = base.groupBy(col("__bucket"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__nsub",
            greatest(lit(1L), ceil(col("__n") / lit(maxBucketSize))).cast("int"))
        base.join(sizes.select(col("__bucket"), col("__nsub")), Seq("__bucket"))
          .withColumn("__sub", pmod(xxhash64(col("__id")), col("__nsub")).cast("int"))
          .drop("__nsub")
      }
    val a = keyed.select(col("__id").as("id_a"), col("__v").as("__va"),
      col("__bucket"), col("__sub"))
    val b = keyed.select(col("__id").as("id_b"), col("__v").as("__vb"),
      col("__bucket"), col("__sub"))
    a.join(b, Seq("__bucket", "__sub"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine_sim", round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .where(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
  }

  /** Edit-distance verification of candidate pairs: joins document text
    * back onto an `(id_a, id_b)` candidate stream and scores Levenshtein
    * distance over length-capped prefixes — the exact confirmation stage
    * after sketch-based candidate generation (LSH / winnowing), which
    * can only ESTIMATE similarity. Candidates are a vanishing fraction
    * of all pairs, so the O(prefixLen²) DP per pair is affordable, and
    * the prefix cap bounds it regardless of document length.
    *
    * Emits `edit_dist` (on the prefixes) and `norm_sim` =
    * `1 - dist/max(len_a, len_b)` rounded to 6 dp; pairs below
    * `minNormSim` are dropped. Shape: two id-grain equi-joins (text
    * lands on the pair stream) — the corpus never self-joins, and
    * nothing here is all-pairs.
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        pairs: DataFrame, prefixLen: Int = 256,
                        minNormSim: Double = 0.0): DataFrame = {
    require(prefixLen >= 1, s"prefixLen=$prefixLen")
    require(minNormSim >= 0.0 && minNormSim <= 1.0, s"minNormSim=$minNormSim")
    val pref = docs.select(col(idCol).as("__pid"),
      substring(col(textCol), 1, prefixLen).as("__pref"))
    pairs.select(col("id_a"), col("id_b"))
      .join(pref.select(col("__pid"), col("__pref").as("__pa")),
        col("id_a") === col("__pid")).drop("__pid")
      .join(pref.select(col("__pid"), col("__pref").as("__pb")),
        col("id_b") === col("__pid")).drop("__pid")
      .withColumn("edit_dist", levenshtein(col("__pa"), col("__pb")).cast("long"))
      .withColumn("norm_sim",
        round(lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("__pa")), length(col("__pb")), lit(1)).cast("double"), 6))
      .where(col("norm_sim") >= minNormSim)
      .select(col("id_a"), col("id_b"), col("edit_dist"), col("norm_sim"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): embeddings are assigned to k-means clusters
    * (map-only argmax over literal centroids — train them once with
    * [[Similarity.kMeansCentroidsCached]]), near-duplicate pairs are
    * generated WITHIN clusters only (cosine ≥ `threshold`, the
    * skew-capped [[embeddingNearDups]] join), and exactly one survivor
    * — the minimum id — is kept per connected component of the pair
    * graph (the alternating-star closure, O(log² n) rounds).
    *
    * Scale shape: no stage is all-pairs — assignment is map-only,
    * pairing keys on the cluster id with the hot-cluster sub-salting
    * cap, and the closure is the same scale-safe component labeling the
    * text-dedup paths use. Returns the surviving rows of `df`.
    */
  def semanticDedupSurvivors(df: DataFrame, idCol: String, vecCol: String,
                             centroids: Array[Array[Float]], threshold: Double,
                             maxBucketSize: Int = Dedup.DefaultMaxBucketSize)
      : DataFrame = {
    val bucketed = df.withColumn("__cluster",
      Similarity.nearestCentroid(col(vecCol), centroids))
    val pairs = embeddingNearDups(bucketed, idCol, vecCol, "__cluster",
      threshold, maxBucketSize)
    val losers = graft.ops.ConnectedComponents
      .componentsAlternating(pairs.select(col("id_a"), col("id_b")),
        "id_a", "id_b")
      .where(col("component") =!= col("id"))
      .select(col("id").as("__drop_id"))
    df.join(losers, col(idCol) === col("__drop_id"), "left_anti")
  }
}
