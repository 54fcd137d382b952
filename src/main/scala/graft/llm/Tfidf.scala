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
