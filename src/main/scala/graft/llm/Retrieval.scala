package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the corpus — the standard bag-of-words
  * relevance scorer (Robertson & Zaragoza 2009), and the missing
  * retrieval third of the text stack next to [[Tfidf]] (weighting) and
  * [[Similarity]] (dense kNN): given a term query, return the top-k
  * documents by Okapi BM25.
  *
  * Determinism: each per-(doc, term) BM25 contribution is a scalar
  * double computed from EXACT integer inputs (tf, df, dl, N, total
  * length) by one fixed expression tree, then fixed-pointed ONCE to
  * integer micro-units — so the per-document score is an exact integer
  * sum (order-invariant) and the engines agree bit-for-bit, the same
  * grid discipline as [[Tfidf.sparseCosinePairs]].
  *
  * Scale shape: the query-term filter lands directly on the
  * (doc, term)-grain tf table, so only postings for the ≤ |Q| query
  * terms survive into the joins; the query vocabulary (≤ |Q| rows) and
  * the 1-row corpus stats broadcast; doc lengths join doc-grain; the
  * final score is a doc-grain aggregate feeding a top-k order-limit
  * (TakeOrdered — no global sort materializes). The corpus-wide work
  * is the grain-true postings aggregate plus two map-only
  * `size(tokens)` passes — what any index build pays.
  */
object Retrieval {

  /** Exact positional phrase match: documents where `phrase` occurs as
    * consecutive tokens, with occurrence counts. The scalable shape is
    * a positional postings list pruned to the phrase's terms BEFORE any
    * join (the `isin` filter pushes into the token explode, so the
    * (doc, pos) stream carries only candidate tokens — for a rare
    * phrase that is a vanishing fraction of the corpus), then one
    * equi-join per additional term, each keyed on (doc, aligned start
    * position). No regex over the raw text, no per-document scan of
    * full token arrays at match time.
    */
  def phraseMatch(documents: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val toks = documents.select(col(idCol).as("doc_id"),
        posexplode(TextStats.tokens(col(textCol))).as(Seq("pos", "tok")))
      .where(col("tok").isin(phrase.distinct: _*))
    val first = toks.where(col("tok") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val matched = phrase.zipWithIndex.drop(1)
      .foldLeft(first) { case (acc, (term, i)) =>
        val next = toks.where(col("tok") === term)
          .select(col("doc_id"), (col("pos") - i).as("pos"))
        acc.join(next, Seq("doc_id", "pos"))
      }
    matched.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Top-k documents for a bag-of-terms query under BM25.
    *
    * `n_docs` counts the FULL corpus (empty documents too); `avgdl`
    * is total token count over `n_docs` — the usual convention, and
    * empty documents (no postings) simply never score.
    *
    * Document lengths and the corpus totals deliberately do NOT come
    * from the (doc, term) tf table: `dl` is a map-only
    * `size(tokens)` projection and (n_docs, total_len) ONE scalar
    * aggregate over the same scan — so the corpus-wide explode +
    * (doc, term) shuffle runs only for the query-filtered postings
    * (the `isin` pushes below that aggregate), never for lengths.
    *
    * @return (id, n_hits, score) — `n_hits` = how many query terms the
    *         document contains, `score` the BM25 sum rounded to 6dp;
    *         ties break on id.
    */
  def bm25TopDocs(documents: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    require(k >= 1, s"k=$k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"k1=$k1 b=$b")
    val terms = queryTerms.distinct
    val tf = Tfidf.termFrequencies(documents, idCol, textCol)
    val dl = documents.select(col(idCol),
      TextStats.nTokensOf(TextStats.tokens(col(textCol))).as("dl"))
    val stats = documents.agg(count(lit(1)).as("n_docs"),
      sum(TextStats.nTokensOf(TextStats.tokens(col(textCol))))
        .as("total_len"))
    val qv = tf.where(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = col("n_docs").cast("double")
    val idf = log((nd - col("df").cast("double") + 0.5)
      / (col("df").cast("double") + 0.5) + 1.0)
    val denom = col("tf").cast("double") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") * nd
        / col("total_len").cast("double"))
    val contrib = tf.where(col("term").isin(terms: _*))
      .join(broadcast(qv), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        round(idf * (col("tf").cast("double") * lit(k1 + 1.0)) / denom
          * lit(1e6)).cast("long").as("c_micro"))
    contrib.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), sum(col("c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_hits"),
        round(col("score_micro").cast("double") / lit(1e6), 6).as("score"))
  }

}
