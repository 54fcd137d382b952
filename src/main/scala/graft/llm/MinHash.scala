package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over text
  * (shingle → minhash signature → band → bucket-join).
  *
  * Permutation hashes are `md5(perm ':' shingle)` compared
  * lexicographically — deterministic, engine-portable (md5 is
  * bit-identical everywhere, so signatures are exactly oracle-checkable),
  * and uniform enough for Jaccard estimation. The candidate join is the
  * classic LSH band trick: documents shuffle only on (band index, band
  * value), so at 100 TB the all-pairs O(n²) comparison collapses to
  * within-bucket pairs — no cross join ever materializes.
  */
object MinHash {

  /** Word n-gram shingles of the token array (distinct). */
  def shingles(tokens: Column, n: Int = 3): Column =
    array_distinct(
      when(size(tokens) >= n,
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n)))))
        .otherwise(array(concat_ws(" ", tokens))))

  /** One minhash: lexicographic min of salted md5 over the shingles. */
  def minhash(shingles: Column, perm: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(perm.toString), lit(":"), s))))

  /** k-permutation signature as named columns sig_0..sig_{k-1}. */
  def signatureCols(shingles: Column, k: Int = 8): Seq[Column] =
    (0 until k).map(p => minhash(shingles, p).as(s"sig_$p"))

  /** Attach signature columns to a frame with an `idCol` and `textCol`. */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 8): DataFrame = {
    val sh = shingles(TextStats.tokens(col(textCol)), n)
    df.select(col(idCol) +: signatureCols(sh, k): _*)
  }

  /** LSH band values: concatenation of `rowsPerBand` consecutive sigs. */
  def bandCols(k: Int, rowsPerBand: Int): Seq[Column] = {
    require(k % rowsPerBand == 0, "k must divide into bands")
    (0 until k / rowsPerBand).map { b =>
      concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"sig_${b * rowsPerBand + r}")): _*)
        .as(s"band_$b")
    }
  }

  /** Candidate near-duplicate pairs: documents sharing ≥1 LSH band.
    * Output: (id_a, id_b, n_matching_sigs, est_jaccard) with id_a < id_b.
    * The self-join keys on (band index, band value) — a bounded shuffle,
    * not a cross join.
    */
  def dupPairs(df: DataFrame, idCol: String, textCol: String,
               n: Int = 3, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sigs = signatures(df, idCol, textCol, n, k)
    val withBands = sigs.select(col(idCol) +: (0 until k).map(p => col(s"sig_$p"))
      ++: bandCols(k, rowsPerBand): _*)
    val nBands = k / rowsPerBand
    val exploded = withBands.select(col(idCol), posexplode(
      array((0 until nBands).map(b => col(s"band_$b")): _*)).as(Seq("band_idx", "band_val")))
    val a = exploded.toDF("id_a", "band_idx", "band_val")
    val b = exploded.toDF("id_b", "band_idx", "band_val")
    val cand = a.join(b, Seq("band_idx", "band_val"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sa = sigs.toDF(s"id_a" +: (0 until k).map(p => s"a_sig_$p"): _*)
    val sb = sigs.toDF(s"id_b" +: (0 until k).map(p => s"b_sig_$p"): _*)
    val matches = (0 until k).map(p =>
      when(col(s"a_sig_$p") === col(s"b_sig_$p"), 1).otherwise(0)).reduce(_ + _)
    cand.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"),
        matches.cast("long").as("n_matching_sigs"),
        (matches.cast("double") / lit(k.toDouble)).as("est_jaccard"))
  }
}
