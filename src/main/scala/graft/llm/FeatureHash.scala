package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The hashing trick — fixed-width bag-of-words features with no
  * vocabulary: each token hashes to one of `dims` buckets with a ±1
  * sign, and a document's feature vector is the signed count per
  * bucket. The signature step of every vocabulary-free text model
  * (Vowpal-Wabbit-style linear models, hashed n-gram classifiers for
  * quality/language gates): no dictionary build, no OOV, memory fixed
  * at `dims` — which is exactly why it scales to a 100 TB corpus where
  * a vocabulary would itself be a distributed-join problem
  * (cf. [[Tfidf]], which pays that cost when exact terms matter).
  *
  * Bucket and sign both come from the token's md5 (same portable-hash
  * discipline as the MinHash/winnow family): bucket = first 8 hex
  * digits mod `dims`, sign = the 9th hex digit's low bit. Signed
  * hashing keeps collision noise zero-mean (Weinberger et al. 2009) —
  * with unsigned counts, every collision only inflates.
  *
  * Shape: one explode to token grain, one (doc, bucket)-grain
  * aggregate — map-side combinable, no vocabulary state anywhere.
  * Output is the long (sparse) form; net-zero buckets are kept so the
  * result is the exact signed sum, not a filtered view of it.
  */
object FeatureHash {

  /** Signed hashed bucket features per document.
    * @return (idCol, bucket, value) with bucket ∈ [0, dims)
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     dims: Int = 64): DataFrame = {
    require(dims > 0, s"dims=$dims")
    val toks = docs.select(col(idCol),
      explode(TextStats.tokens(col(textCol))).as("__t"))
    val h = md5(col("__t"))
    val bucket = pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
      lit(dims.toLong))
    val sign = when(substring(h, 9, 1)
      .isin("0", "1", "2", "3", "4", "5", "6", "7"), lit(1L))
      .otherwise(lit(-1L))
    toks.select(col(idCol), bucket.as("bucket"), sign.as("__s"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__s")).as("value"))
  }

  /** ANSI/DuckDB twin of [[hashedFeatures]] over `documents`;
    * `toksExpr` is the engine's token-array fragment (the shared
    * `Toks`), `filterSql` an optional doc predicate. Keep in lockstep.
    */
  def hashedFeaturesSql(toksExpr: String, dims: Int,
                        filterSql: String = "TRUE"): String =
    s"""WITH base AS (
       |  SELECT doc_id, $toksExpr AS toks FROM documents WHERE $filterSql
       |), t AS (
       |  SELECT doc_id, md5(unnest(toks)) AS h FROM base
       |), f AS (
       |  SELECT doc_id,
       |         (('0x' || substr(h, 1, 8))::BIGINT % $dims + $dims) % $dims AS bucket,
       |         CASE WHEN substr(h, 9, 1) IN ('0','1','2','3','4','5','6','7')
       |              THEN 1 ELSE -1 END AS s
       |  FROM t
       |)
       |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       |       CAST(sum(s) AS BIGINT) AS value
       |FROM f GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin
}
