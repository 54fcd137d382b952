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
    // postings restricted to the query terms BEFORE the (doc, term)
    // shuffle: only candidate postings ever enter an exchange
    val tfq = documents
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = documents.select(col(idCol),
      TextStats.nTokensOf(TextStats.tokens(col(textCol))).as("dl"))
    val stats = documents.agg(count(lit(1)).as("n_docs"),
      sum(TextStats.nTokensOf(TextStats.tokens(col(textCol))))
        .as("total_len"))
    val qv = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = col("n_docs").cast("double")
    val idf = log((nd - col("df").cast("double") + 0.5)
      / (col("df").cast("double") + 0.5) + 1.0)
    val denom = col("tf").cast("double") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") * nd
        / col("total_len").cast("double"))
    val contrib = tfq
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

  /** Multi-query BM25 with document-as-query: each query is the
    * DISTINCT token set of a selected document, every query scores the
    * whole corpus in ONE postings join — the lexical half of hybrid
    * retrieval ("find documents like this one, by words").
    *
    * Scale shape: the query-term table is |Q| documents' vocabularies
    * (KBs — broadcast), so the corpus-wide (doc, term) tf table joins
    * it term-keyed exactly once regardless of |Q|; df comes from one
    * aggregate over that SAME filtered join (postings for non-query
    * terms never shuffle); lengths and corpus totals are the map-only
    * projections of [[bm25TopDocs]]. Per-(query, doc, term)
    * contributions micro-round to integers before the (query, doc)
    * sum, so ranks are bit-stable across engines and partitionings.
    *
    * Self-pairs (candidate == query document) are excluded — the
    * retrieval convention, and what makes the ranking comparable to a
    * kNN list over the same ids.
    *
    * @return (query_id, rank, idCol, score_micro) for the top `k`
    *         candidates per query; ties break on candidate id.
    */
  def bm25DocQueries(documents: DataFrame, idCol: String, textCol: String,
                     queryPred: org.apache.spark.sql.Column, k: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k=$k")
    val qterms = documents.where(queryPred)
      .select(col(idCol).as("query_id"),
        explode(array_distinct(TextStats.tokens(col(textCol)))).as("term"))
    val dl = documents.select(col(idCol),
      TextStats.nTokensOf(TextStats.tokens(col(textCol))).as("dl"))
    val stats = documents.agg(count(lit(1)).as("n_docs"),
      sum(TextStats.nTokensOf(TextStats.tokens(col(textCol))))
        .as("total_len"))
    val qvocab = qterms.select(col("term")).distinct()
    // postings restricted to the query vocabulary BEFORE the
    // (doc, term) shuffle: the full-vocabulary tf aggregate (which used
    // to shuffle the whole corpus' (doc, term) table twice — once per
    // reference) never runs at all; only query-term postings enter the
    // exchange (guide §2.3, filter before the shuffle)
    val tfq = documents
      .select(col(idCol), explode(TextStats.tokens(col(textCol))).as("term"))
      .join(broadcast(qvocab), "term")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nd = col("n_docs").cast("double")
    val idf = log((nd - col("df").cast("double") + 0.5)
      / (col("df").cast("double") + 0.5) + 1.0)
    val denom = col("tf").cast("double") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") * nd
        / col("total_len").cast("double"))
    val contrib = tfq
      .join(broadcast(qterms), "term")
      .where(col(idCol) =!= col("query_id"))
      .join(broadcast(df), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol),
        round(idf * (col("tf").cast("double") * lit(k1 + 1.0)) / denom
          * lit(1e6)).cast("long").as("c_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol))
    contrib.groupBy(col("query_id"), col(idCol))
      .agg(sum(col("c_micro")).as("score_micro"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("score_micro"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of a
    * dense and a lexical ranking: `rrf(d) = Σ_lists 1/(kRrf + rank)`,
    * the standard hybrid-retrieval combiner — rank-only, so the two
    * systems' incomparable score scales never touch.
    *
    * Both inputs are per-query top-N lists (query_id, rank, id); the
    * fuse is a full outer join at (query, candidate) grain — grain-true
    * (≤ 2N rows per query enter), no corpus access. Contributions are
    * computed as `floor(1e9 / (kRrf + rank))` nano-units: with ranks
    * bounded by N ≪ 1e4 the true value is a rational with denominator
    * < kRrf + N, so its double image is never within an ulp of an
    * integer unless it IS one — floor is therefore engine-exact, and
    * the fused score an exact integer sum.
    *
    * @return (query_id, rank, id, rrf_nano, rank_dense, rank_lex) — the
    *         top `k` fused candidates per query, fused-score
    *         descending, ties on candidate id; a candidate absent from
    *         one list carries a null rank there.
    */
  def rrfFuse(dense: DataFrame, lex: DataFrame, idCol: String, k: Int,
              kRrf: Int = 60): DataFrame = {
    require(k >= 1 && kRrf >= 1, s"k=$k kRrf=$kRrf")
    def nano(rank: org.apache.spark.sql.Column) =
      coalesce(
        floor(lit(1e9) / (lit(kRrf.toDouble) + rank.cast("double")))
          .cast("long"),
        lit(0L))
    val d = dense.select(col("query_id"), col(idCol),
      col("rank").as("rank_dense"))
    val l = lex.select(col("query_id"), col(idCol),
      col("rank").as("rank_lex"))
    val fused = d.join(l, Seq("query_id", idCol), "full_outer")
      .withColumn("rrf_nano",
        nano(col("rank_dense")) + nano(col("rank_lex")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("rrf_nano").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol), col("rrf_nano"),
        col("rank_dense"), col("rank_lex"))
  }

}
