package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The built suffix structure over a document corpus.
  *
  * @param seq    corpus sequence: `idCol, dseq, pos, n_tok, g, key, is_tok,
  *               rem` — one row per token plus one unique SENTINEL row per
  *               document (`is_tok = false`, `pos = n_tok + 1`). `g` is the
  *               1-based global position, `rem` the tokens remaining in the
  *               document from `pos` (0 for sentinels). Checkpointed.
  * @param sa     `g, r` — the suffix rank of every global position, a
  *               permutation of 1..n (sentinel uniqueness makes every
  *               suffix distinct). Checkpointed.
  * @param levels ascending `(prefixLen, (g, r))` rank tables from each
  *               doubling round: two positions share `r` at level `p` iff
  *               their suffixes agree on the first `p` symbols. Kept for
  *               LCP binary lifting; ~log2(maxDocLen) tables of n rows.
  * @param n      corpus length (tokens + sentinels).
  */
final case class SuffixArrayResult(seq: DataFrame, sa: DataFrame,
                                   levels: Seq[(Long, DataFrame)], n: Long)

/** Distributed suffix array over a tokenized document corpus — the EXACT
  * substring-dedup structure (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better", whose dedup step builds exactly
  * this), complementing the fixed-w approximate path in
  * [[SubstringDedup]]: the suffix array answers repeated-span questions
  * at EVERY length at once (longest repeated substring, LCP spectra,
  * duplicated w-gram positions for any w) with no hashing anywhere.
  *
  * The paper builds one giant in-memory array with pointer-chasing —
  * the opposite of a distributed plan. Spark-first shape instead:
  * Manber–Myers PREFIX DOUBLING as a fixed point of DataFrame rounds,
  *
  *   1. corpus sequence: per-document token rows plus one UNIQUE
  *      per-document sentinel, globally positioned by a two-phase
  *      ranged prefix-sum over documents (never a data-grain
  *      single-partition window);
  *   2. round 0 ranks positions by their single symbol (vocabulary
  *      rank; sentinels below all tokens, mutually distinct);
  *   3. each round pairs every position's rank with the rank `k`
  *      ahead (one 1:1 integer self-equi-join) and re-ranks by the
  *      pair — ranking is a deterministic-percentile range bucketing,
  *      a per-bucket local sort, a bounded bucket-offset table, and a
  *      min-rownumber group join ([[Windows.leadRanged]]'s discipline:
  *      no `RangePartitioner` sampling, no global sort);
  *   4. terminate when all ranks are distinct. Sentinel uniqueness
  *      bounds the fixed point at ⌈log2(maxDocLen)⌉+1 rounds — the
  *      round count scales with DOCUMENT length, not corpus size, so
  *      a 100 TB corpus of web pages still needs only ~12 rounds.
  *
  * Every round is checkpointed (lineage stays flat); the level tables
  * are retained because they ARE the LCP index: [[adjacentLcp]] lifts
  * through them with two integer equi-joins per level, giving exact
  * LCPs between rank-adjacent suffixes in O(log maxDocLen) joins.
  *
  * Everything is exact integer arithmetic — no hashes, no floats — so
  * the full rank structure is bit-identical to a DuckDB twin that
  * sorts materialized suffix keys (feasible because sentinel
  * uniqueness also bounds every pairwise LCP by maxDocLen: the twin
  * sorts FIXED-WIDTH bounded prefixes, not full suffixes).
  *
  * Scale notes: ranks and positions are raw longs (n up to 2^62);
  * the bucketing proxy packs the rank pair into a double for
  * `percentile_approx` ONLY — rounding is monotone, so bucket
  * assignment stays consistent with the exact (ra, rb) sort used
  * inside each bucket, and ties merely share a bucket. With a tiny
  * vocabulary the round-0 buckets are vocabulary-grain skewed (each
  * distinct symbol is one indivisible tie group); from round 1 the
  * pair keys spread and the percentile cuts balance.
  */
object SuffixArray {

  /** Corpus sequence table (see [[SuffixArrayResult.seq]]). `idCol` must
    * be numeric, non-null and unique; document order is `idCol`
    * ascending. The global positions come from a ranged two-phase
    * prefix-sum over documents: deterministic percentile buckets on
    * `idCol`, per-bucket local `row_number`/cumulative sums, and a
    * bounded per-bucket offset table — the document spine never funnels
    * through one task.
    */
  def corpusSeq(docs: DataFrame, idCol: String, textCol: String,
                numRanges: Int = 32): DataFrame = {
    // tokenize ONCE: the token arrays feed the length spine, the
    // vocabulary and the position explode — three references, three
    // full scan+tokenize passes without the checkpoint (the caller
    // releases these scratch blocks once the corpus sequence itself is
    // checkpointed)
    val toksDf = graft.Memos.adaptiveCheckpoint(
      docs.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks")))
    val lens = toksDf.select(col(idCol), size(col("__toks")).cast("long").as("n_tok"))

    // ranged prefix-sum over the document spine: dseq (1-based document
    // index) and off (global positions consumed by prior documents,
    // each contributing n_tok + 1 for its sentinel)
    val fracs = lit((1 until numRanges).map(_.toDouble / numRanges).toArray)
    val cuts = lens.agg(
      percentile_approx(col(idCol).cast("double"), fracs, lit(10000)).as("__cuts"))
    val bucketed = lens.crossJoin(broadcast(cuts))
      .withColumn("__pid",
        size(filter(col("__cuts"), c => c <= col(idCol).cast("double"))))
      .drop("__cuts")
      .repartition(numRanges, col("__pid"))
    val wl = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    val wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed
      .withColumn("__rn", row_number().over(wl).cast("long"))
      .withColumn("__cum", sum(col("n_tok") + 1L).over(wc))
    val totals = bucketed.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), sum(col("n_tok") + 1L).as("__tot"))
    // numRanges rows — driver-safe window
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = totals
      .withColumn("__cntOff", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .withColumn("__sumOff", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__cntOff"), col("__sumOff"))
    val di = local.join(broadcast(offs), Seq("__pid"))
      .select(col(idCol), col("n_tok"),
        (col("__cntOff") + col("__rn")).as("dseq"),
        (col("__sumOff") + col("__cum") - col("n_tok") - 1L).as("off"))

    val dCount = lens.count()

    // vocabulary ranks: 1-based by binary (UTF8) token order. Vocabulary
    // grain — bounded by the language, not the corpus — so the single
    // window is the "bounded grid" class, like BPE's merge table.
    val vocab = toksDf.select(explode(col("__toks")).as("__tok")).distinct()
      .withColumn("__vr", row_number().over(Window.orderBy(col("__tok"))).cast("long"))

    val tokRows = toksDf.join(di, Seq(idCol))
      .select(col(idCol), col("dseq"), col("off"), col("n_tok"),
        posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .join(vocab, Seq("__tok"))
      .select(col(idCol), col("dseq"),
        (col("__p0") + 1L).as("pos"), col("n_tok"),
        (col("off") + col("__p0") + 1L).as("g"),
        (lit(dCount) + col("__vr")).as("key"),
        lit(true).as("is_tok"),
        (col("n_tok") - col("__p0")).as("rem"))
    val sentinels = di.select(col(idCol), col("dseq"),
      (col("n_tok") + 1L).as("pos"), col("n_tok"),
      (col("off") + col("n_tok") + 1L).as("g"),
      col("dseq").as("key"),
      lit(false).as("is_tok"),
      lit(0L).as("rem"))
    tokRows.unionByName(sentinels)
  }

  /** One doubling-round rank assignment: global min-rownumber rank of
    * each row under the exact (ra, rb) order. Deterministic percentile
    * cuts on a monotone double proxy pick the range buckets; the exact
    * long pair orders rows inside each bucket; bucket row-counts
    * (a `numRanges`-row table) offset local row numbers to global ones;
    * the rank of a row is the min global row number over its exact
    * (ra, rb) group — correct even when a tie group straddles a bucket
    * boundary, because the group min is taken globally.
    */
  private def assignRanks(paired: DataFrame, proxyScale: Double,
                          numRanges: Int): DataFrame = {
    val fracs = lit((1 until numRanges).map(_.toDouble / numRanges).toArray)
    val proxy = col("ra").cast("double") * lit(proxyScale) + col("rb").cast("double")
    val cuts = paired.agg(percentile_approx(proxy, fracs, lit(10000)).as("__cuts"))
    val bucketed = paired.withColumn("__cd", proxy)
      .crossJoin(broadcast(cuts))
      .withColumn("__pid", size(filter(col("__cuts"), c => c <= col("__cd"))))
      .drop("__cuts", "__cd")
      .repartition(numRanges, col("__pid"))
    val wl = Window.partitionBy(col("__pid")).orderBy(col("ra"), col("rb"))
    // checkpoint AFTER the per-bucket window: `local` feeds the bucket
    // counts, the group-min aggregate and the final join — left lazy,
    // each reference re-runs the whole pair join + repartition + sort
    // (the r12 audit measured the window subtree executing twice and the
    // pair join four times per round). Released before return: the round
    // only hands its final rank table to the caller.
    val local = bucketed.withColumn("__rn", row_number().over(wl).cast("long"))
      .localCheckpoint(true)
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1) // numRanges rows
    val offs = counts
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))
    val withGlobal = local.join(broadcast(offs), Seq("__pid"))
      .withColumn("__gr", col("__off") + col("__rn"))
    val groupMin = withGlobal.groupBy(col("ra"), col("rb"))
      .agg(min(col("__gr")).as("r"))
    val out = withGlobal.join(groupMin, Seq("ra", "rb"))
      .select(col("g"), col("r"))
      .localCheckpoint(true)
    // the intra-round scratch blocks have no reader past this point
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(local)
    out
  }

  /** Build the suffix array by prefix doubling (see object doc). */
  def build(docs: DataFrame, idCol: String, textCol: String,
            numRanges: Int = 32): SuffixArrayResult = {
    val seqRaw = corpusSeq(docs, idCol, textCol, numRanges)
    val seq = seqRaw.localCheckpoint(true)
    // corpusSeq's internal token-array checkpoint has no reader once the
    // sequence itself is materialized
    org.apache.spark.sql.graftbridge.CheckpointBridge.release(seqRaw)
    val n = seq.count()
    // monotone bucketing proxy: ranks and shifted ranks are <= n (round-0
    // keys <= 2n); any scale above the max rb keeps the proxy monotone
    val proxyScale = (n + 2).toDouble

    var level = assignRanks(
      seq.select(col("g"), col("key").as("ra"), lit(0L).as("rb")),
      proxyScale, numRanges)
    var levels = Vector(1L -> level)
    var prefLen = 1L
    var nGroups = level.agg(count_distinct(col("r"))).head.getLong(0)
    while (nGroups < n && prefLen < n) {
      val shifted = level.select((col("g") - prefLen).as("g"), col("r").as("__rshift"))
      val paired = level.join(shifted, Seq("g"), "left")
        .select(col("g"), col("r").as("ra"),
          coalesce(col("__rshift"), lit(0L)).as("rb"))
      level = assignRanks(paired, proxyScale, numRanges)
      prefLen *= 2
      levels :+= (prefLen -> level)
      nGroups = level.agg(count_distinct(col("r"))).head.getLong(0)
    }
    SuffixArrayResult(seq, level, levels, n)
  }

  /** Exact LCP between every rank-adjacent suffix pair, by binary
    * lifting through the doubling level tables: descending over levels
    * `p = 2^t`, advance both cursors by `p` whenever the level-`p`
    * ranks at the cursors agree (ranks agree at level `p` iff the next
    * `p` symbols agree). Greedy-from-the-top is exact because every
    * adjacent LCP is strictly below the final (all-distinct) level's
    * prefix length. Two integer equi-joins per level; checkpointed per
    * level so the plan stays flat.
    *
    * @return `rank_hi, g_lo, g_hi, lcp` — one row per rank pair
    *         (r-1, r), `rank_hi = r` in 2..n.
    */
  def adjacentLcp(res: SuffixArrayResult): DataFrame = {
    val lo = res.sa.select((col("r") + 1L).as("r"), col("g").as("g_lo"))
    var pairs = res.sa.join(lo, Seq("r"))
      .select(col("r").as("rank_hi"), col("g_lo"), col("g").as("g_hi"),
        lit(0L).as("lcp"))
      .localCheckpoint(true)
    for ((p, rt) <- res.levels.reverse) {
      val ra = rt.select(col("g").as("__ga"), col("r").as("__ra"))
      val rb = rt.select(col("g").as("__gb"), col("r").as("__rb"))
      val prev = pairs
      pairs = pairs
        .withColumn("__ka", col("g_lo") + col("lcp"))
        .withColumn("__kb", col("g_hi") + col("lcp"))
        .join(ra, col("__ka") === col("__ga"), "left")
        .join(rb, col("__kb") === col("__gb"), "left")
        .withColumn("lcp", col("lcp") +
          when(col("__ra").isNotNull && col("__rb").isNotNull &&
            col("__ra") === col("__rb"), lit(p)).otherwise(lit(0L)))
        .select(col("rank_hi"), col("g_lo"), col("g_hi"), col("lcp"))
        .localCheckpoint(true)
      // `prev` is a bare checkpoint leaf (its plan holds no level
      // table), superseded the moment the new generation materializes —
      // without the release the lift pins one n-row generation per
      // level for the whole walk (scale hygiene, not bench speed)
      org.apache.spark.sql.graftbridge.CheckpointBridge.release(prev)
    }
    pairs
  }

  /** Token positions whose w-token gram occurs at least twice anywhere
    * in the corpus (same or other document) — derived purely from the
    * suffix structure: a suffix's w-prefix repeats iff its LCP with a
    * rank-NEIGHBOR is >= w (suffixes sharing a w-prefix are contiguous
    * in suffix order). Exact at every w <= maxDocLen from ONE build —
    * the fixed-w shingle path ([[SubstringDedup]]) re-scans the corpus
    * per w.
    *
    * @return `idCol, pos` for each duplicated w-gram start position.
    */
  def dupPositions(res: SuffixArrayResult, idCol: String, w: Int): DataFrame =
    dupPositionsFrom(res, adjacentLcp(res), idCol, w)

  /** [[dupPositions]] over a precomputed [[adjacentLcp]] table — callers
    * sharing the lifting across several consumers pass it in.
    */
  def dupPositionsFrom(res: SuffixArrayResult, lcp: DataFrame,
                       idCol: String, w: Int): DataFrame = {
    require(w >= 1, s"w=$w")
    val nbr = lcp.select(col("g_lo").as("g"), col("lcp"))
      .unionByName(lcp.select(col("g_hi").as("g"), col("lcp")))
      .groupBy(col("g")).agg(max(col("lcp")).as("__mx"))
      .where(col("__mx") >= w)
      .select(col("g"))
    res.seq.where(col("is_tok") && col("rem") >= w)
      .join(nbr, Seq("g"))
      .select(col(idCol), col("pos"))
  }
}
