package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick pre-training documents whose hashed-n-gram distribution looks
  * like a TARGET domain, by importance weight under two bag-of-hashed-
  * n-grams unigram models. The canonical "give me 1B target-like docs
  * out of 100 TB of crawl" operator, and the statistical upgrade of
  * [[FeatureHash]]'s representation: same hashing trick, but the
  * buckets feed a generative ratio score instead of a linear model.
  *
  * Pipeline: (1) featurize every document into `dims` hashed buckets
  * (word unigrams + bigrams, md5-hashed — the portable-hash discipline
  * of the MinHash/winnow family); (2) fit add-one-smoothed bucket
  * models on the target slice and on the full raw pool; (3) score each
  * document `log w(x) = Σ_b cnt_x[b]·(ln p_t[b] − ln p_r[b])`;
  * (4) resample without replacement by the Gumbel-top-k trick with a
  * hash-deterministic Gumbel (so the "random" sample is reproducible
  * and oracle-certifiable, like every sampler in [[Curation]]).
  *
  * Scale shape: featurization is one explode + one (doc, bucket)-grain
  * aggregate (map-side combinable; the bucket space is fixed at `dims`,
  * so no vocabulary state anywhere). Each model is exactly `dims` rows
  * — BROADCAST onto the feature stream regardless of corpus size.
  * Scoring is one doc-grain BIGINT sum; resampling is a top-k
  * (TakeOrderedAndProject), never a global sort. Nothing data-grain
  * ever self-joins.
  *
  * Cross-engine exactness (the [[LangModel]] discipline): each
  * bucket's log-probability difference is rounded ONCE to integer
  * nano-units at model grain (≤ `dims` ln calls per model); per-doc
  * scores are then `Σ cnt·Δlp_nano` — BIGINT-exact and partitioning /
  * accumulation-order invariant. The Gumbel key is one ln pair per
  * document from a md5-derived uniform, also rounded once to nano, so
  * `key = logw_nano + gumbel_nano` is pure BIGINT arithmetic.
  */
object Dsir {

  /** 2^60 as a double — the md5-prefix uniform's denominator. 15 hex
    * digits span [0, 2^60); `(h + 0.5) / 2^60` is strictly inside
    * (0, 1), so both ln's in the Gumbel transform are finite.
    */
  private val Pow2_60 = 1152921504606846976.0

  /** Hashed n-gram (word unigram + bigram) bucket counts per document:
    * `(idCol, bucket, cnt)` with bucket ∈ [0, dims). Bigrams join the
    * two tokens with a single space before hashing, so the bucket of
    * "a b" never collides with the unigram "a" except by md5 chance.
    */
  def hashedNgramCounts(docs: DataFrame, idCol: String, textCol: String,
                        dims: Int): DataFrame = {
    require(dims > 0, s"dims=$dims")
    val toks = TextStats.tokens(col(textCol))
    // sequence(1, 0) counts DOWN in Spark — guard short docs explicitly
    val bigrams = when(size(col("__toks")) >= 2,
      transform(sequence(lit(1), size(col("__toks")) - 1),
        i => concat(element_at(col("__toks"), i), lit(" "),
          element_at(col("__toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val grams = docs.select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        explode(concat(col("__toks"), bigrams)).as("__g"))
    val bucket = pmod(conv(substring(md5(col("__g")), 1, 8), 16, 10)
      .cast("long"), lit(dims.toLong))
    grams.select(col(idCol), bucket.as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Add-one-smoothed bucket model over a feature slice: the full
    * `dims`-row spine (zero-count buckets included — scoring joins must
    * be total), `lp_nano = round(ln((cnt+1)/(total+dims))·1e9)`.
    * @param feats any frame with `bucket, cnt` rows (doc grain is fine;
    *              counts are summed)
    */
  def bucketModel(feats: DataFrame, dims: Int): DataFrame = {
    val spine = feats.sparkSession.range(dims)
      .select(col("id").as("bucket"))
    val counts = feats.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("__c"))
    val withSpine = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("__c"), lit(0L)).as("cnt"))
    val tot = withSpine.agg(sum(col("cnt")).as("__total"))
    withSpine.join(broadcast(tot))
      .select(col("bucket"),
        round(log((col("cnt").cast("double") + 1.0) /
          (col("__total").cast("double") + lit(dims.toDouble))) *
          lit(1e9)).cast("long").as("lp_nano"))
  }

  /** Per-document log importance weights in nano-units:
    * `(idCol, n_feats, logw_nano)` — `n_feats` is the document's total
    * n-gram count, `logw_nano = Σ_b cnt_b·(lp_t − lp_r)` (BIGINT).
    * Documents with no features (empty text) score 0. The two models
    * are joined once into a single `dims`-row Δlp table and broadcast.
    */
  def importanceWeights(feats: DataFrame, idCol: String,
                        targetModel: DataFrame,
                        rawModel: DataFrame): DataFrame = {
    val dlp = targetModel.select(col("bucket"),
        col("lp_nano").as("__lp_t"))
      .join(rawModel.select(col("bucket"), col("lp_nano").as("__lp_r")),
        Seq("bucket"))
      .select(col("bucket"),
        (col("__lp_t") - col("__lp_r")).as("__dlp"))
    feats.join(broadcast(dlp), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("__dlp")).as("logw_nano"))
  }

  /** Hash-deterministic Gumbel key in nano-units for id `id`:
    * `u = (first-15-hex-of-md5(id) + 0.5) / 2^60` ∈ (0,1),
    * `gumbel_nano = round(−ln(−ln u)·1e9)`. One double chain per
    * document, rounded once — the sampler is reproducible across runs,
    * partitionings, and engines.
    */
  def gumbelNano(id: Column): Column =
    round(-log(-log(
      (conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
        .cast("double") + 0.5) / lit(Pow2_60))) * lit(1e9)).cast("long")

  /** Gumbel-top-k resample without replacement, probability ∝ w(x):
    * rank by `key_nano = logw_nano + gumbel_nano` descending (doc id
    * breaks exact BIGINT ties). Output
    * `(sample_rank, idCol, key_nano)`, `sample_rank` 1-based.
    */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    import org.apache.spark.sql.expressions.Window
    val keyed = weights.select(col(idCol),
      (col("logw_nano") + gumbelNano(col(idCol))).as("key_nano"))
    // a global top-k: the window is a rank over ONE ordered stream, but
    // Spark plans limit-pushdown via TakeOrdered when we sort+limit
    // instead — keep the sort+limit form so no single-task full window
    // materializes at corpus scale
    keyed.orderBy(col("key_nano").desc, col(idCol))
      .limit(k)
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("key_nano").desc,
          col(idCol))))
      .select(col("sample_rank"), col(idCol), col("key_nano"))
  }
}
