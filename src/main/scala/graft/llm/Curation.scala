package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: PII scrubbing, benchmark-contamination
  * detection, deterministic stratified sampling, and within-document
  * repetition metrics (extension surface — SURVEY.md §7.2 step 6; the
  * reference's pipeline stops at warehouse DQ gates, dags/pdq_etl_dag.py).
  *
  * Everything is either a pure column expression (map-only, codegen'd,
  * linear at 100 TB) or a shingle-grain equi-join (contamination — same
  * shuffle shape as MinHash LSH candidate generation, never all-pairs).
  * Patterns stick to the regex subset shared by Java regex and RE2 (no
  * lookarounds/backrefs) so results are exactly oracle-checkable.
  */
object Curation {

  // ----- PII scrubbing ---------------------------------------------------

  /** (pattern, replacement token) applied in order by [[scrubPii]].
    * Order matters: emails are scrubbed before phone/number patterns so a
    * digit-bearing local-part isn't half-eaten by a later rule.
    */
  val PiiRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    // two phone forms: a leading \b cannot sit before '(' (both sides are
    // non-word chars), so the parenthesized area code is its own rule
    "(?:\\+?1[-. ])?\\([0-9]{3}\\) ?[0-9]{3}[-. ][0-9]{4}\\b" -> "<PHONE>",
    "\\b(?:\\+?1[-. ])?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b" -> "<PHONE>",
    "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b" -> "<IP>",
    "\\b[0-9]{13,19}\\b" -> "<LONGNUM>")

  /** Redact PII-shaped spans (emails, NANP phone numbers, IPv4 addresses,
    * card-length digit runs) with typed placeholder tokens. Map-only
    * regexp_replace chain — Spark replaces ALL occurrences by default
    * (DuckDB needs the 'g' flag to match).
    */
  def scrubPii(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (pat, tok)) => regexp_replace(c, pat, tok) }

  /** Count of redactions a [[scrubPii]] pass performs, per rule token:
    * run the scrub, then count placeholder occurrences. Placeholders are
    * counted on the SCRUBBED text so overlapping rules aren't
    * double-counted.
    */
  def redactionCount(scrubbed: Column, token: String): Column =
    // placeholder tokens contain no regex metacharacters by construction
    graft.functions.RegexpCount.regexpCount(scrubbed, token)

  // ----- benchmark contamination ----------------------------------------

  /** Corpus documents sharing at least `minShared` distinct word-shingles
    * with any benchmark document — the standard train/test contamination
    * sweep, as a shingle-grain equi-join:
    *
    *   corpus → explode(shingles)  ⋈ shingle ⋈  benchmark → explode(shingles)
    *   → groupBy (corpus_doc, bench_doc) → count ≥ minShared
    *
    * The shuffle is keyed by shingle (like LSH banding) then by doc pair —
    * never an all-pairs product, so it holds at corpus × benchmark scale.
    *
    * `maxBenchDf` guards the remaining hot spot: a shingle present in many
    * BENCHMARK docs multiplies every corpus occurrence by its benchmark
    * document frequency (join fan-out = corpus_df × bench_df per shingle).
    * Capping benchmark-side df drops those stopword-like shingles before
    * the join — standard contamination practice, since a phrase shared by
    * half the benchmark identifies nothing. Corpus-side df needs no cap:
    * each corpus occurrence is one row and bench_df is already bounded.
    *
    * Returns (corpus id, benchmark id, n_shared_shingles).
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    minShared: Int = 1,
                    maxBenchDf: Int = Int.MaxValue): DataFrame = {
    def exploded(df: DataFrame, outId: String) =
      df.select(col(idCol).as(outId),
          MinHash.shingles(TextStats.tokens(col(textCol))).as("__sh"))
        .select(col(outId), explode(col("__sh")).as("__shingle"))
    val bench = exploded(benchmark, "bench_id")
    val benchKept =
      if (maxBenchDf == Int.MaxValue) bench
      else {
        // shingles are distinct per doc, so count(*) at shingle grain IS df
        val df = bench.groupBy(col("__shingle"))
          .agg(count(lit(1)).as("__df"))
          .where(col("__df") <= maxBenchDf)
        bench.join(df.select(col("__shingle")), Seq("__shingle"), "left_semi")
      }
    // EXPLICIT broadcast: benchmark suites are small by definition, but
    // the post-explode size ESTIMATE is fan-out-inflated and can push the
    // planner past autoBroadcastJoinThreshold at corpus scale — which
    // would shuffle the exploded corpus at shingle grain, the one shuffle
    // this operator exists to avoid. With the hint, the corpus side never
    // shuffles; the only exchange left is the (corpus_id, bench_id)
    // match aggregate, which is bounded by true contamination volume.
    exploded(corpus, "corpus_id")
      .join(broadcast(benchKept), Seq("__shingle"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared_shingles"))
      .where(col("n_shared_shingles") >= minShared)
  }

  // ----- deterministic stratified sampling -------------------------------

  // Two-prime residue mix for [[sampleBucket]]. P1/P2 are distinct primes
  // just under 2^31, so (id % P) * A stays under 2^62 and the two-term sum
  // under 2^63 — no 64-bit overflow on any engine (DuckDB raises on BIGINT
  // overflow rather than wrapping, so portability REQUIRES staying in
  // range). Two ids share a bucket pattern only if congruent mod BOTH
  // primes, i.e. mod P1*P2 ≈ 4.6e18 — effectively the whole 63-bit id
  // space, unlike a single small-modulus pre-reduction whose period a
  // sharded id scheme can alias with.
  private val SampleP1 = 2147483647L // 2^31 - 1 (Mersenne prime)
  private val SampleP2 = 2147483629L // largest prime below P1
  private val SampleA = 1000000007L
  private val SampleB = 998244353L

  /** Deterministic hash bucket in [0, 1e6) for an integer id — the shared
    * arithmetic behind [[sampleHash]]. Pure BIGINT ops, overflow-free for
    * |id| < 2^62, so the SAME rows are kept on every engine and every run
    * (`rand()` is neither reproducible nor oracle-checkable).
    * [[sampleBucketSql]] is the ANSI-SQL twin; keep them in lockstep.
    */
  def sampleBucket(id: Column, seed: Long): Column =
    pmod((id % lit(SampleP1)) * lit(SampleA) +
      (id % lit(SampleP2)) * lit(SampleB) + lit(seed), lit(1000000L))

  /** ANSI-SQL twin of [[sampleBucket]]. The outer reduction uses the
    * double-`%` pmod idiom `((x % m) + m) % m` because ANSI `%` follows
    * the dividend's sign: a negative id would otherwise land below every
    * keep-threshold on the SQL side while Spark's `pmod` kept it — a
    * silent engine divergence. (The INNER `id % P` terms deliberately stay
    * plain `%`: Spark's `%` is also sign-of-dividend there, so the two
    * sides agree term by term for any id sign.)
    */
  def sampleBucketSql(idExpr: String, seed: Long): String = {
    val mixed =
      s"(($idExpr % $SampleP1) * $SampleA + ($idExpr % $SampleP2) * $SampleB + $seed)"
    s"((($mixed % 1000000) + 1000000) % 1000000)"
  }

  /** Keep-decision for a deterministic `fraction` sample keyed on an
    * integer id: keep iff [[sampleBucket]] falls below `fraction * 1e6`.
    * A smaller fraction's keep-set is a subset of a larger one (same
    * seed), since the bucket does not depend on the fraction.
    */
  def sampleHash(id: Column, fraction: Double, seed: Long = 12345L): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    sampleBucket(id, seed) < lit((fraction * 1e6).toLong)
  }

  /** Stratified sample: one deterministic fraction per stratum value
    * (missing strata keep nothing). Map-only — the filter pushes to the
    * scan; no shuffle, no per-stratum pass, unlike `sampleByKey`'s
    * per-partition RNG which is neither deterministic across runs nor
    * engine-portable.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 12345L): DataFrame = {
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, sampleHash(col(idCol), f, seed))
        .otherwise(acc)
    }
    df.where(keep)
  }

  /** Deterministic train/validation/test assignment keyed on an integer
    * id: the split every training-data release needs, and the one place
    * a random split silently poisons evaluation — a per-run RNG assigns
    * the SAME document to train today and test tomorrow. Here the
    * assignment is a pure function of (id, seed): reproducible across
    * runs, engines, and repartitionings, and documents never migrate
    * between splits when the corpus grows (the [[sampleBucket]] hash
    * does not depend on corpus size).
    *
    * `weights` are (name, weight) in order; each id lands in the split
    * whose cumulative bucket range covers `sampleBucket(id, seed)` (the
    * 1e6-bucket space is divided proportionally, earlier splits first,
    * last split absorbing the rounding remainder). Map-only — one added
    * column, no shuffle.
    */
  def datasetSplit(id: Column, weights: Seq[(String, Double)],
                   seed: Long = 12345L): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + (w / total * 1e6).toLong }.tail
    val bucket = sampleBucket(id, seed)
    // last split takes everything past its cut (rounding remainder)
    weights.init.zip(cuts.init).foldRight(lit(weights.last._1)) {
      case (((name, _), cut), acc) => when(bucket < cut, name).otherwise(acc)
    }
  }

  /** ANSI-SQL twin of [[datasetSplit]]; keep in lockstep. */
  def datasetSplitSql(idExpr: String, weights: Seq[(String, Double)],
                      seed: Long = 12345L): String = {
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + (w / total * 1e6).toLong }.tail
    val bucket = sampleBucketSql(idExpr, seed)
    val whens = weights.init.zip(cuts.init).map { case ((name, _), cut) =>
      s"WHEN $bucket < $cut THEN '$name'" }.mkString(" ")
    s"(CASE $whens ELSE '${weights.last._1}' END)"
  }

  // ----- the curation funnel ---------------------------------------------

  /** The standard corpus-curation funnel as one composition:
    *
    *   quality + repetition filter → [trained gate] → exact dedup
    *   (min-id survivor) → deterministic sample
    *
    * with language-ID and quality carried through as columns. Tokenizes
    * once: every stat reads the materialized token attribute. Shapes:
    * the filters and sampler are map-only; dedup is the one shuffle
    * (fingerprint-keyed window). All stages are individually
    * oracle-checked; the funnel's own query checks the composition.
    *
    * `gate`, when given, is an id-keyed keep frame (e.g. the trained
    * [[LinearProbe.scoreGate]] — the model-based quality filter of the
    * GPT-3/CCNet pipelines): an INNER join on `idCol` applies it
    * after the rule filters and BEFORE dedup, so a gated-out document
    * can never survive as its fingerprint group's min-id and shadow a
    * kept duplicate. The gate's non-id columns (e.g. the model score)
    * ride through to the output.
    *
    * Returns the surviving rows of `df` plus `n_tokens`, `quality_score`,
    * `lang_pred`, `fingerprint`, and any gate-carried columns.
    */
  def curateCorpus(df: DataFrame, idCol: String, textCol: String,
                   minQuality: Double = 0.5,
                   maxDupTokenRatio: Double = 0.9,
                   sampleFraction: Double = 1.0,
                   seed: Long = 12345L,
                   gate: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val passthrough = df.columns.filterNot(_ == textCol).map(col).toSeq
    val base = df.select(passthrough :+ col(textCol) :+
      TextStats.tokens(col(textCol)).as("__toks"): _*)
    val hitCols = TextStats.langHits(col("__toks"))
    val stats = base.select(passthrough ++ Seq(
      col(textCol), col("__toks"),
      TextStats.nTokensOf(col("__toks")).as("n_tokens"),
      TextStats.punctRatio(col(textCol)).as("__punct_ratio"),
      TextStats.stopwordRatioOf(col("__toks")).as("__stopword_ratio"),
      dupRatioOf(col("__toks")).as("__dup_token_ratio"),
      TextStats.fingerprint(col(textCol)).as("fingerprint")) ++
      hitCols.map { case (lang, c) => c.as(s"__hits_$lang") }: _*)
    val scored = stats
      .withColumn("quality_score", TextStats.qualityScoreOf(
        col("n_tokens"), col("__punct_ratio"), col("__stopword_ratio")))
      .withColumn("lang_pred", TextStats.langPredOf(
        hitCols.map { case (lang, _) => lang -> col(s"__hits_$lang") }))
    val filtered = scored.where(
      col("quality_score") >= minQuality &&
        col("__dup_token_ratio") <= maxDupTokenRatio)
    val gated = gate.fold(filtered)(g => filtered.join(g, Seq(idCol)))
    val gateCols = gate.toSeq.flatMap(_.columns).filterNot(_ == idCol).map(col)
    val w = Window.partitionBy(col("fingerprint")).orderBy(col(idCol))
    val deduped = gated
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("__rn") === 1)
    val sampled =
      if (sampleFraction >= 1.0) deduped
      else deduped.where(sampleHash(col(idCol), sampleFraction, seed))
    sampled.select(passthrough ++ Seq(col(textCol), col("n_tokens"),
      col("quality_score"), col("lang_pred"), col("fingerprint")) ++
      gateCols: _*)
  }

  // ----- weighted source mixing ------------------------------------------

  /** Deterministic weighted mixture over a source column — the
    * data-mixing step of a training pipeline ("web ×2.5, books ×1,
    * forums ×0.25"). Weight w emits ⌊w⌋ full copies of every row plus one
    * [[sampleHash]]-selected partial copy for the fractional remainder;
    * sources missing from `weights` are dropped. The fractional pick uses
    * an offset seed so it is decorrelated from other samplers over the
    * same ids, and reproducible run to run.
    *
    * Map-side only: the explode fans each row out at most ⌈w⌉ times, no
    * shuffle — at 100 TB the mixture is free next to the write behind it.
    */
  def weightedMix(df: DataFrame, idCol: String, sourceCol: String,
                  weights: Map[String, Double],
                  seed: Long = 12345L): DataFrame = {
    require(weights.values.forall(w => w >= 0.0), "weights must be >= 0")
    val nCopies = weights.foldLeft(lit(0)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(math.ceil(w).toInt)).otherwise(acc)
    }
    val fullCopies = weights.foldLeft(lit(0)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(math.floor(w).toInt)).otherwise(acc)
    }
    val frac = weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w - math.floor(w))).otherwise(acc)
    }
    val fracKeep = weights.foldLeft(lit(false)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s,
        sampleHash(col(idCol), w - math.floor(w), seed + 7919L)).otherwise(acc)
    }
    df.withColumn("__n", nCopies)
      .where(col("__n") > 0) // sequence(1, 0) would run DESCENDING, not empty
      .withColumn("copy", explode(sequence(lit(1), col("__n"))))
      .where(col("copy") <= fullCopies || (frac > 0.0 && fracKeep))
      .drop("__n")
  }

  // ----- document chunking (sliding token windows) -----------------------

  /** Split each document into `size`-token chunks starting every `stride`
    * tokens (overlapping when stride < size) — the windowing step of RAG
    * indexing and long-document pretraining. Map-only: the explode emits
    * ⌈n/stride⌉ rows per doc and every chunk slices the SAME materialized
    * token array; no shuffle, linear at corpus scale. Tail chunks shorter
    * than `size` are kept (`n_chunk_tokens` carries the actual length).
    *
    * Expects the token-array column already materialized (tokenize-once).
    * Output: input columns + (chunk_idx, n_chunk_tokens, chunk_text).
    */
  def chunkTokens(df: DataFrame, toksCol: String,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0, s"size=$size stride=$stride")
    df.where(org.apache.spark.sql.functions.size(col(toksCol)) > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          expr(s"(size($toksCol) - 1) div $stride").cast("int"))))
      .withColumn("n_chunk_tokens",
        least(lit(size),
          org.apache.spark.sql.functions.size(col(toksCol)) - col("chunk_idx") * stride)
          .cast("long"))
      .withColumn("chunk_text",
        concat_ws(" ", slice(col(toksCol), col("chunk_idx") * stride + 1, lit(size))))
  }

  // ----- sequence packing (concat-and-chunk plan) ------------------------

  /** Packing plan for fixed-length training sequences: documents
    * concatenate in `idCol` order and split into `budget`-token chunks
    * (the GPT-style concat-and-chunk dataloader). Emits each document's
    * global start offset, the chunk it starts in, and its offset inside
    * that chunk — enough for a writer to materialize packed sequences
    * without re-scanning.
    *
    * The running total is a window over `idCol`; with `shardCol` given it
    * partitions per shard (each shard packs independently — the form that
    * scales, since a global ordered window is one task). Leave `shardCol`
    * empty only for small/demo corpora.
    */
  def concatChunkPlan(df: DataFrame, idCol: String, nTokensCol: String,
                      budget: Int, shardCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget=$budget")
    import org.apache.spark.sql.expressions.Window
    val base = shardCol.map(s => Window.partitionBy(col(s))).getOrElse(Window.partitionBy())
    val w = base.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("start_offset",
        (sum(col(nTokensCol)).over(w) - col(nTokensCol)).cast("long"))
      .withColumn("chunk_id", expr(s"start_offset div $budget"))
      .withColumn("offset_in_chunk", pmod(col("start_offset"), lit(budget.toLong)))
  }

  /** GLOBALLY contiguous packing plan at corpus scale — the form
    * [[concatChunkPlan]]'s doc warns about: a single global ordered
    * window is one task, so this decomposes the same arithmetic into
    * shards. Concatenation order is (`shardCol`, `idCol`) lexicographic;
    * offsets are identical to one global window over that order (proved
    * by the spec differential and the oracle, which computes exactly that
    * single window):
    *
    *   1. per-shard running totals — a parallel window partitioned on the
    *      shard (each shard is one window partition; pick shards so one
    *      shard's rows fit a task, e.g. `pmod(id, 1024)` over dense ids);
    *   2. shard token totals → EXCLUSIVE prefix sum, a one-task window
    *      over #shards ROWS (KBs, not the corpus);
    *   3. broadcast the shard bases back — no second shuffle of the
    *      corpus.
    *
    * Output matches [[concatChunkPlan]]: input columns +
    * (start_offset, chunk_id, offset_in_chunk).
    */
  def concatChunkPlanGlobal(df: DataFrame, idCol: String, nTokensCol: String,
                            budget: Int, shardCol: String): DataFrame = {
    require(budget > 0, s"budget=$budget")
    import org.apache.spark.sql.expressions.Window
    val wLocal = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("__local_offset",
      (sum(col(nTokensCol)).over(wLocal) - col(nTokensCol)).cast("long"))
    val wShards = Window.orderBy(col(shardCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = df.groupBy(col(shardCol))
      .agg(sum(col(nTokensCol)).cast("long").as("__shard_tokens"))
      .withColumn("__shard_base",
        coalesce(sum(col("__shard_tokens")).over(wShards), lit(0L)))
      .select(col(shardCol), col("__shard_base"))
    local.join(broadcast(bases), Seq(shardCol))
      .withColumn("start_offset", col("__shard_base") + col("__local_offset"))
      .withColumn("chunk_id", expr(s"start_offset div $budget"))
      .withColumn("offset_in_chunk", pmod(col("start_offset"), lit(budget.toLong)))
      .drop("__local_offset", "__shard_base")
  }

  // ----- within-document repetition --------------------------------------

  /** Repetition ratio of any array column: fraction of elements that are
    * repeats of an earlier element, `1 - distinct/total` (0 for empty
    * arrays). Gopher-style repetition signal; high values flag
    * boilerplate/spam. Pass a pre-materialized ATTRIBUTE column — the
    * array is referenced three times here, so an inlined expression would
    * be built three times per row.
    *
    * Apply to tokens for token diversity, and to [[shinglesAll]] for
    * phrase repetition (a doc looping one sentence has low token
    * diversity but near-total shingle repetition).
    */
  def dupRatioOf(arr: Column): Column =
    when(size(arr) > 0,
      lit(1.0) - size(array_distinct(arr)).cast("double") / size(arr).cast("double"))
      .otherwise(lit(0.0))

  /** ALL word n-gram shingles, repeats preserved (unlike
    * [[MinHash.shingles]], which dedups for set-based Jaccard/minhash) —
    * repetition measurement needs the multiplicity. Pass an attribute
    * column (HOF re-evaluation trap).
    */
  def shinglesAll(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  // ----- per-source document caps ----------------------------------------

  /** The ids that survive a per-source cap: at most `cap` documents per
    * `srcCol` value, chosen in deterministic hash order
    * ([[sampleBucket]] of the id, id as tiebreak inside the packed
    * metric) — the domain-cap curation step that stops one hot site from
    * dominating a corpus mix. Hash order rather than id order so the
    * kept subset is an unbiased sample of the source, not its earliest
    * crawl ids; the same seed gives the same survivors on every engine
    * and every run.
    *
    * Scale shape: selection rides the bounded-heap
    * [[graft.functions.TopKAgg]], so the shuffle carries ≤ `cap` entries
    * per (source × map partition) instead of the source's full document
    * stream — a hot domain with 10⁸ docs costs its scan, not a sorted
    * window partition on one task (the `row_number` window form the
    * oracle uses IS that one-task-per-source shape). The packed metric
    * `-(bucket·2⁴² + id)` makes top-k-by-metric-desc exactly "the `cap`
    * smallest (bucket, id)" and is collision-free for non-negative ids
    * below 2⁴² (~4.4e12 — beyond any corpus's doc count).
    */
  def sourceCapIds(df: DataFrame, idCol: String, srcCol: String, cap: Int,
                   seed: Long = 12345L): DataFrame = {
    require(cap >= 1, s"cap=$cap")
    import graft.functions.TopKAgg.topK
    val metric = -(sampleBucket(col(idCol), seed) * lit(1L << 42) +
      col(idCol).cast("long"))
    df.select(col(srcCol).as("source"), col(idCol).cast("long").as("__id"),
        metric.as("__m"))
      .groupBy(col("source"))
      .agg(topK(col("__id").cast("string"), col("__m"), cap).as("__top"))
      .select(col("source"), explode(col("__top")).as("e"))
      .select(col("source"), col("e.item").cast("long").as(idCol))
  }

  /** Apply the per-source cap: keep only [[sourceCapIds]] survivors.
    * One equi-join at id grain (left semi) — the kept-id table is
    * `sources × cap` rows, which shuffles fine even when too large to
    * broadcast.
    */
  def sourceCap(df: DataFrame, idCol: String, srcCol: String, cap: Int,
                seed: Long = 12345L): DataFrame =
    df.join(sourceCapIds(df, idCol, srcCol, cap, seed).select(col(idCol)),
      Seq(idCol), "left_semi")

  // ----- temperature-based mixture allocation ----------------------------

  /** Temperature-flattened sampling allocation — the `p_l ∝ n_l^α`
    * upweighting multilingual/multi-source pretraining uses (mC4,
    * XLM-R: α ≈ 0.3-0.7) so head sources don't drown the tail: α = 1
    * samples proportional to size, α = 0 samples uniformly, and values
    * between trade head coverage for tail epochs.
    *
    * Per source, from its exact token count: the raw share, the
    * α-flattened sampling probability, the token allocation under
    * `budgetTokens`, and `epochs` = allocation / corpus size — the
    * column mixture designers gate on ("α=0.3 cycles the smallest
    * source 40×; raise α or cap epochs").
    *
    * Scale shape: one keyed aggregate to source grain, then a 1-row
    * broadcast of the two totals back over the (tiny) source table.
    * The only doubles are the final closed-form `pow`/ratios over exact
    * long moments — 6-decimal-rounded, engine-twinnable.
    */
  def temperatureAllocation(df: DataFrame, srcCol: String, nToksCol: String,
                            alpha: Double, budgetTokens: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha outside [0,1]")
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens")
    val bySrc = df.groupBy(col(srcCol).as("source"))
      .agg(sum(col(nToksCol).cast("long")).as("n_tokens"),
        count(lit(1)).as("n_docs"))
    val flat = pow(col("n_tokens").cast("double"), lit(alpha))
    val totals = bySrc.agg(sum(col("n_tokens")).as("__tot"),
      sum(flat).as("__tot_flat"))
    bySrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot").cast("double"), 6)
          .as("raw_share"),
        round(flat / col("__tot_flat"), 6).as("p_alpha"),
        round(lit(budgetTokens.toDouble) * flat / col("__tot_flat"), 6)
          .as("alloc_tokens"),
        round(lit(budgetTokens.toDouble) * flat / col("__tot_flat") /
          col("n_tokens").cast("double"), 6).as("epochs"))
  }

  /** Largest-remainder (Hamilton) quota allocation: split an integer
    * `budget` across groups proportionally to a weight, with the
    * floored shares topped up one unit at a time in order of largest
    * fractional remainder (ties to the smaller group value) until the
    * budget is EXACTLY exhausted — the standard way to turn
    * [[temperatureAllocation]]-style real-valued shares into sampling
    * quotas that actually sum to the budget (floors alone under-spend,
    * naive rounding over-spends).
    *
    * Entirely integer: share = ⌊budget·w/W⌋, remainder = budget·w mod
    * W, rank over remainders — bit-identical on any engine. Shape: one
    * group-grain aggregate + a GROUP-grain rank window (a handful of
    * sources, never data grain).
    *
    * Overflow envelope: `budget · w_g` must fit int64 — 10⁵ budgets
    * over 10¹³-scale weights; rescale weights first past that.
    *
    * @return (groupCol, weight, share_floor, alloc) with
    *         Σ alloc = budget (when Σ weight > 0)
    */
  def quotaAllocate(df: DataFrame, groupCol: String, weightCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget")
    val byG = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol).cast("long")).as("weight"))
    val totals = byG.agg(sum(col("weight")).as("__w"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol).asc)
    val whole = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(groupCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    byG.crossJoin(broadcast(totals))
      .withColumn("share_floor",
        expr(s"(${budget}L * weight) div __w"))
      .withColumn("__rem", expr(s"(${budget}L * weight) % __w"))
      .withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__spent", sum(col("share_floor")).over(whole))
      .withColumn("alloc",
        col("share_floor") +
          when(col("__rank") <= lit(budget) - col("__spent"), 1L)
            .otherwise(0L))
      .select(col(groupCol), col("weight"), col("share_floor"), col("alloc"))
  }

  /** Top-p (nucleus) selection per group: order a group's documents by
    * (score desc, id) and keep the smallest prefix holding at least
    * `pMicro`/1e6 of the group's total score mass — the
    * quality-budgeted curation cut ("the best half of each source's
    * characters"), the set analog of nucleus sampling. The crossing
    * element is INCLUDED (keep while cumulative-mass-before <
    * p·total), so a group always keeps ≥ 1 document and the kept mass
    * is the least prefix ≥ the budget.
    *
    * All comparisons are exact longs (`cumBefore·1e6 < pMicro·total`),
    * so the cut is bit-identical on any engine. One per-GROUP window
    * sort (source grain — the partition count a curation run controls),
    * never a global one.
    *
    * @return kept rows: (groupCol, idCol, scoreCol, rank)
    */
  def nucleusSelect(df: DataFrame, groupCol: String, idCol: String,
                    scoreCol: String, pMicro: Long): DataFrame = {
    require(pMicro > 0 && pMicro <= 1000000L, s"pMicro=$pMicro")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    val before = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val whole = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.select(col(groupCol), col(idCol), col(scoreCol).cast("long")
        .as(scoreCol))
      .withColumn("__before",
        coalesce(sum(col(scoreCol)).over(before), lit(0L)))
      .withColumn("__total", sum(col(scoreCol)).over(whole))
      .withColumn("rank", row_number().over(w).cast("long"))
      // decimal(38,0) cross-multiply: a long `before * 1e6` wraps past
      // ~9.2e12 score units (hit at the sf1 certification — cents-grain
      // totals at 10x scale), and with ANSI off the wrap is SILENT
      .where(col("__before").cast("decimal(38,0)") * lit(1000000L) <
        lit(pMicro) * col("__total").cast("decimal(38,0)"))
      .drop("__before", "__total")
  }
}
