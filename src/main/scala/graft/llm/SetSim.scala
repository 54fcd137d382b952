package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity joins under a Jaccard threshold — the
  * complement to the probabilistic near-dup family ([[MinHash]] LSH
  * misses pairs with band-boundary similarity; these find EVERY pair
  * ≥ the threshold, with candidate generation that still never goes
  * all-pairs).
  *
  * Two classic candidate-pruning strategies:
  *  - [[prefixFilterPairs]] — AllPairs/PPJoin prefix filtering
  *    (Bayardo et al., WWW'07): order every token set by
  *    ascending global document frequency; two sets with Jaccard ≥ t
  *    MUST share a token inside their (1-t)-fraction prefixes, so the
  *    candidate join runs on rare prefix tokens only.
  *  - [[sortedNeighborhoodPairs]] — blocked sorted-neighborhood
  *    (Hernández & Stolfo, SIGMOD'95): sort within blocking partitions
  *    by a key that collates near-dups adjacently, compare only rows
  *    within a fixed window of positions.
  *
  * Both verify candidates with the exact integer intersection/union
  * arithmetic of [[Jaccard]] — the threshold compare is one double
  * division of exact integers, deterministic across engines.
  */
object SetSim {

  /** (id, toks) where `toks` is the DISTINCT word-3-gram shingle set —
    * the same set grain as [[MinHash]]/[[Jaccard]], and far more
    * discriminative than unigram vocabulary (in a topical corpus most
    * documents share most unigrams, so a unigram-set join degenerates
    * toward all-pairs; shingle similarity is bimodal).
    */
  private def shingleSets(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        MinHash.shingles(TextStats.tokens(col(textCol))).as("toks"))
      .where(size(col("toks")) > 0)

  /** All pairs with shingle-set Jaccard ≥ `threshold`, via prefix
    * filtering. EXACT: returns precisely the pairs a brute-force scan
    * would (proven against brute force in `SetSimSpec`), but the
    * candidate join touches only each set's rare-token prefix of length
    * `s - ceil(t·s) + 1`.
    *
    * Scale shape: doc frequencies are one vocab-grain aggregate and the
    * global rarity order is the (df, token) pair itself — no global
    * rank window anywhere; per-doc ordering is a
    * doc-grain aggregate; the candidate join is token-keyed on PREFIX
    * tokens only — rare by construction (frequency-ascending order
    * pushes head tokens out of prefixes), so no hot token key. The
    * length filter `min(s_a,s_b) ≥ t·max(s_a,s_b)` prunes before
    * verification; verification reads two materialized arrays per
    * surviving candidate.
    */
  def prefixFilterPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold=$threshold")
    val sets = shingleSets(docs, idCol, textCol)
    val dt = sets.select(col("id"), explode(col("toks")).as("token"))
    // global rarity order = ascending (df, token). Sorting by the PAIR
    // directly is the same total order a row_number rank would induce,
    // without materializing a single-partition window over the vocab —
    // the df agg and the sort both stay fully parallel.
    val ranked = dt.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    // each doc's tokens in rarity order, as one array
    val ordered = dt.join(ranked, Seq("token"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("token"))))
        .as("rt"))
      .select(col("id"),
        transform(col("rt"), r => r("token")).as("toks"),
        size(col("rt")).cast("long").as("s"))
    val prefixes = ordered.select(col("id"), col("s"),
      explode(slice(col("toks"), lit(1),
        (col("s") - ceil(lit(threshold) * col("s")) + 1).cast("int")))
        .as("token"))
    val cand = prefixes.alias("a")
      .join(prefixes.alias("b"),
        col("a.token") === col("b.token") && col("a.id") < col("b.id"))
      .where(least(col("a.s"), col("b.s")).cast("double") >=
        lit(threshold) * greatest(col("a.s"), col("b.s")).cast("double"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val full = ordered.select(col("id"), col("toks"))
    cand
      .join(full.select(col("id").as("id_a"), col("toks").as("toks_a")),
        Seq("id_a"))
      .join(full.select(col("id").as("id_b"), col("toks").as("toks_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Jaccard.jaccardDistinct(col("toks_a"), col("toks_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Sorted-neighborhood candidate pairs within blocking partitions:
    * rows sort by (`sortKey`, id) INSIDE each `blockCol` partition, and
    * only pairs within `window` positions are compared — the
    * deliberately-approximate cheap pass (recall depends on the sort
    * key collating near-dups; the spec measures it against brute
    * force), at a cost linear in `window`.
    *
    * Scale shape: the position pass is a `Window PARTITION BY block` —
    * never a global single-partition sort; candidate pairing is an
    * equi-join on (block, position-bucket) with adjacent-bucket
    * expansion, so a pair at distance ≤ w is found in the same or
    * neighboring bucket and the join stays co-keyed. Verification reads
    * materialized token arrays.
    *
    * @return (block, id_a, id_b, pos_gap, jaccard) for pairs with
    *         Jaccard ≥ `threshold`
    */
  def sortedNeighborhoodPairs(docs: DataFrame, idCol: String,
                              textCol: String, blockCol: String,
                              sortKey: Column, window: Int,
                              threshold: Double): DataFrame = {
    require(window >= 1, s"window=$window")
    // threshold 0 = UNGATED: every within-window candidate pair, with
    // its jaccard — the feed a downstream scorer (e.g.
    // [[graft.ops.Linkage]]) wants, where disagreeing pairs are signal
    require(threshold >= 0 && threshold <= 1, s"threshold=$threshold")
    val base = docs.select(col(idCol).as("id"), col(blockCol).as("block"),
        sortKey.as("key"),
        MinHash.shingles(TextStats.tokens(col(textCol))).as("toks"))
      .where(size(col("toks")) > 0)
    val pos = base.select(col("id"), col("block"), col("toks"),
      row_number().over(
        Window.partitionBy(col("block")).orderBy(col("key"), col("id")))
        .cast("long").as("pos"))
    val withBucket = pos.withColumn("bucket",
      expr(s"(pos - 1L) div ${window}L"))
    // pairs at distance ≤ window live in the same or adjacent bucket
    val left = withBucket.select(col("block"), col("bucket"),
      col("id").as("id_a"), col("pos").as("pos_a"), col("toks").as("toks_a"))
    val right = withBucket
      .select(col("block"), explode(array(col("bucket"), col("bucket") - 1))
          .as("bucket"),
        col("id").as("id_b"), col("pos").as("pos_b"), col("toks").as("toks_b"))
    left.join(right, Seq("block", "bucket"))
      .where((col("pos_b") - col("pos_a")).between(1, window))
      .select(col("block"), col("id_a"), col("id_b"),
        (col("pos_b") - col("pos_a")).as("pos_gap"),
        Jaccard.jaccardDistinct(col("toks_a"), col("toks_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
