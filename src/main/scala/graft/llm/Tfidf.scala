package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term statistics: vocabulary document-frequency and TF-IDF
  * scoring — the standard text-analysis layer over a token stream.
  *
  * Shapes for scale: one explode + two key-grain aggregations (term and
  * (doc, term)); the tiny corpus-size frame joins in by broadcast cross
  * join, and the document-frequency table joins on the term key — no
  * driver-side `.count()` actions inside the plan, so the whole thing
  * stays one lazy DAG.
  */
object Tfidf {

  /** (doc, term, tf) from a documents frame. */
  def termFrequencies(documents: DataFrame, idCol: String, textCol: String): DataFrame =
    documents
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (term, df, total_tf) vocabulary table. */
  def vocabulary(tf: DataFrame, idCol: String): DataFrame =
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))

  /** TF-IDF with smoothed IDF `ln((N+1)/(df+1))`, N supplied as a
    * one-row frame (kept lazy; Catalyst broadcasts it).
    */
  def tfidf(tf: DataFrame, vocab: DataFrame, nDocs: DataFrame,
            idCol: String): DataFrame =
    tf.join(vocab.select(col("term"), col("df")), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log((col("n_docs").cast("double") + 1.0) / (col("df").cast("double") + 1.0)))

  /** Exact sparse cosine-similarity pairs over the df-capped TF-IDF
    * vocabulary, via the inverted index — the sparse-vector complement
    * to [[Similarity]]'s dense-embedding kNN: no embeddings needed,
    * candidates come from shared rare-ish terms.
    *
    * Semantics: cosine over the vocabulary restricted to `df ≤ maxDf`.
    * The cap is part of the DEFINITION, not an approximation knob — it
    * is the standard IR stopword discipline (ubiquitous terms carry no
    * discrimination), and at scale it is also what bounds the inverted
    * index join: a term's pair fanout is ≤ maxDf², so no hot-token key
    * can go quadratic in the corpus.
    *
    * Determinism: each (doc, term) weight `tf · ln((N+1)/(df+1))` is
    * fixed-pointed ONCE to integer micro-units (same grid discipline as
    * [[LangModel]]'s lp_nano); norms and dot products are then EXACT
    * integer sums in decimal(38,0) (w ≤ ~1e9 ⇒ w² ≤ ~1e18 per term —
    * a long sum could overflow across terms, the decimal cannot), and
    * the single double division + 6dp round happens per pair at the
    * end. Partitioning-invariant, engine-invariant.
    *
    * Scale shape: weights are one (doc, term)-grain join against the
    * capped vocab; norms one doc-grain aggregate; the pair join keys on
    * `term` (never all-pairs) and re-aggregates at pair grain; the two
    * norm joins are id-grain. One shuffle per grain, nothing
    * driver-side.
    */
  def sparseCosinePairs(documents: DataFrame, idCol: String, textCol: String,
                        maxDf: Long, threshold: Double,
                        ngram: Int = 1): DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf (a df-1 term can never pair)")
    require(threshold > 0 && threshold <= 1, s"threshold=$threshold")
    require(ngram >= 1, s"ngram=$ngram")
    // ngram > 1 scores over word n-grams (repeats preserved — these are
    // FREQUENCIES, not the distinct sets the dedup family uses). The
    // right grain for corpora whose unigram vocabulary is near-universal
    // per doc: there a unigram tf-idf has nothing rare to weigh, while
    // n-gram frequencies keep discriminating.
    val units =
      if (ngram == 1) TextStats.tokens(col(textCol))
      else Curation.shinglesAll(TextStats.tokens(col(textCol)), ngram)
    val tf = documents
      .select(col(idCol), explode(units).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val vocab = vocabulary(tf, idCol).where(col("df") <= maxDf)
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val w = tf.join(vocab.select(col("term"), col("df")), "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        round(col("tf").cast("double") *
          log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)) * lit(1e6))
          .cast("long").as("w"))
      .where(col("w") =!= 0L)
    val norms = w.groupBy(col(idCol))
      .agg(sum(col("w").cast("decimal(38,0)") * col("w")).as("n2"))
    val a = w.select(col(idCol).as("id_a"), col("term"), col("w").as("wa"))
    val b = w.select(col(idCol).as("id_b"), col("term"), col("w").as("wb"))
    val dots = a.join(b, Seq("term"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa").cast("decimal(38,0)") * col("wb")).as("dot"))
    dots
      .join(norms.select(col(idCol).as("id_a"), col("n2").as("na2")), "id_a")
      .join(norms.select(col(idCol).as("id_b"), col("n2").as("nb2")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))), 6)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Zipf-law fit over the head of the vocabulary: the least-squares
    * slope of `ln(frequency)` against `ln(rank)` for the `topK` most
    * frequent units — the standard corpus-health diagnostic (natural
    * text sits near slope −1; a synthetic or templated corpus shows up
    * as a flat or cliff-shaped head). `-slope` is the fitted Zipf
    * exponent.
    *
    * Determinism: both logs are fixed-pointed ONCE at vocab grain to
    * integer micro-units (the [[LangModel]] grid discipline), so the
    * regression moments are exact integer sums ([[graft.ops.Trend]])
    * and the slope is one engine-invariant double division. The slope
    * is scale-free (both axes carry the same 1e6 factor); the intercept
    * is in micro-ln units.
    *
    * Scale shape: one unit-grain aggregate for counts, a topK
    * order-limit (TakeOrdered — no global sort materializes), a
    * window over the ≤ topK-row head ONLY, and a 1-row moment
    * aggregate. The corpus never touches the window.
    */
  def zipfFit(documents: DataFrame, idCol: String, textCol: String,
              topK: Int, ngram: Int = 1): DataFrame = {
    require(topK >= 2, s"topK=$topK (a slope needs two points)")
    require(ngram >= 1, s"ngram=$ngram")
    val units =
      if (ngram == 1) TextStats.tokens(col(textCol))
      else Curation.shinglesAll(TextStats.tokens(col(textCol)), ngram)
    val head = documents.select(explode(units).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("total_tf"))
      .orderBy(col("total_tf").desc, col("term")).limit(topK)
    // rank over the ≤ topK-row head — the "tiny grid" window discipline
    val ranked = head.select(col("total_tf"),
      row_number().over(Window.orderBy(col("total_tf").desc, col("term")))
        .cast("long").as("rank"))
    val fixed = ranked.select(lit("corpus").as("corpus"),
      round(log(col("rank").cast("double")) * lit(1e6))
        .cast("long").as("ln_rank_micro"),
      round(log(col("total_tf").cast("double")) * lit(1e6))
        .cast("long").as("ln_tf_micro"))
    graft.ops.Trend.linearTrend(fixed, Seq("corpus"),
      col("ln_rank_micro"), col("ln_tf_micro"))
  }

  /** Top-k terms per document by (rounded tfidf desc, term) — total
    * order, deterministic.
    */
  def topTerms(documents: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val tf = termFrequencies(documents, idCol, textCol)
    val vocab = vocabulary(tf, idCol)
    val n = documents.agg(count(lit(1)).as("n_docs"))
    val scored = tfidf(tf, vocab, n, idCol)
      .withColumn("tfidf", round(col("tfidf"), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }
}
