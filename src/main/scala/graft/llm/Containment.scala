package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Containment / overlap-coefficient dedup: find documents whose shingle
  * set is (mostly) CONTAINED in another document's — the partial-copy
  * case symmetric Jaccard under-scores. A 200-word quote pasted into a
  * 10,000-word page has Jaccard ≈ 0.02 against its source but overlap
  * coefficient |A∩B| / min(|A|,|B|) ≈ 1.0; training-data curation wants
  * the second number (the quote is duplicated text even though the host
  * pages differ).
  *
  * Scale shape (the reason this is not `ngramJaccard` over candidate
  * pairs): candidates come from a SHINGLE-GRAIN self-join — the same
  * never-all-pairs discipline as [[Dedup.winnowDupPairsFromFps]] — and
  * the shared-shingle count IS the exact |A∩B| over distinct shingles,
  * so no per-pair array compare ever runs. Sizes join back at doc grain.
  * A doc-frequency cap (`maxDocsPerShingle`) drops boilerplate shingles
  * from the NUMERATOR only (sizes stay true set sizes), bounding the
  * hot-shingle fan-out exactly like `maxDocsPerFp` does for winnowing;
  * the resulting overlap is therefore a documented LOWER bound in the
  * presence of capped shingles.
  */
object Containment {

  /** Distinct (doc, shingle) table — tokenize → n-gram → explode →
    * distinct, eagerly `localCheckpoint`ed: it feeds the size aggregate,
    * the frequency gate, and BOTH self-join sides, and the text pipeline
    * (regex split + n-gram assembly) is the expensive stage.
    */
  def shingleTable(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(MinHash.shingles(TextStats.tokens(col(textCol)), n))
          .as("shingle"))
      .distinct()
      .localCheckpoint(true)

  /** Pairs with overlap coefficient ≥ `minOverlap`.
    *
    * Output: `(id_a, id_b, n_shared, n_a, n_b, overlap)` with
    * `id_a < id_b`; `n_shared` = shared distinct shingles surviving the
    * frequency cap, `n_a`/`n_b` = true distinct-shingle set sizes,
    * `overlap = n_shared / min(n_a, n_b)` (one int/int IEEE division —
    * bit-identical across engines, no rounding needed).
    */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minOverlap: Double = 0.5,
                   maxDocsPerShingle: Int = 100): DataFrame = {
    require(maxDocsPerShingle >= 2, s"maxDocsPerShingle=$maxDocsPerShingle")
    val sh = shingleTable(df, idCol, textCol, n)
    val sizes = sh.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    // df-1 shingles can't be shared; df>cap shingles are boilerplate —
    // the same gate winnowDupPairsFromFps applies at fingerprint grain.
    val keep = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__nd"))
      .where(col("__nd") > 1 && col("__nd") <= maxDocsPerShingle)
      .select(col("shingle"))
    val filtered = sh.join(keep, Seq("shingle"))
    val a = filtered.select(col("shingle"), col("__id").as("id_a"))
    val b = filtered.select(col("shingle"), col("__id").as("id_b"))
    a.join(b, Seq("shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("__id").as("id_a"), col("__n").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("__id").as("id_b"), col("__n").as("n_b")),
        Seq("id_b"))
      .withColumn("overlap",
        col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"))
      .where(col("overlap") >= minOverlap)
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("n_a"), col("n_b"), col("overlap"))
  }
}
