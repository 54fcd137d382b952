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

  /** Embedding near-duplicate pairs: cosine ≥ threshold, candidates
    * bucketed by `bucketCol` (cluster id / [[Similarity.signBucket]]).
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        bucketCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"),
      col(bucketCol).as("__bucket"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"),
      col(bucketCol).as("__bucket"))
    a.join(b, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine_sim", round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .where(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
  }
}
