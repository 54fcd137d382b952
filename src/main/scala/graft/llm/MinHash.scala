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

  /** Word n-gram shingles of the token array (distinct). Native
    * single-pass expression; [[shinglesDeclarative]] is the bit-identical
    * executable spec. (The declarative nested-lambda form re-evaluates the
    * token expression per shingle index — O(tokens²) per document.)
    */
  def shingles(tokens: Column, n: Int = 3): Column =
    graft.functions.HashExpressions.wordNgrams(tokens, n)

  /** Declarative (built-ins only) formulation of [[shingles]]. */
  def shinglesDeclarative(tokens: Column, n: Int = 3): Column =
    array_distinct(
      when(size(tokens) >= n,
        transform(sequence(lit(1), size(tokens) - (n - 1)),
          i => concat_ws(" ", slice(tokens, i, lit(n)))))
        .otherwise(array(concat_ws(" ", tokens))))

  /** One minhash: lexicographic min of salted md5 over the shingles
    * (declarative executable spec; [[signatures]] computes all k perms in
    * one native-expression pass instead).
    */
  def minhash(shingles: Column, perm: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(perm.toString), lit(":"), s))))

  /** Attach signature columns sig_0..sig_{k-1} to a frame. All k
    * permutations are computed by one
    * [[graft.functions.HashExpressions.MinHashSigs]] evaluation per row
    * (bit-identical to k [[minhash]] columns, k× cheaper).
    */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, k: Int = 8): DataFrame = {
    val sh = shingles(TextStats.tokens(col(textCol)), n)
    df.select(col(idCol), graft.functions.HashExpressions.minhashSigs(sh, k).as("__sigs"))
      .select(col(idCol) +: (0 until k).map(p =>
        element_at(col("__sigs"), p + 1).as(s"sig_$p")): _*)
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
    // The signature table feeds the band explode, then both sides of the
    // final signature-compare join — materialize it once (k hex strings
    // per doc: tiny next to the text it replaces) instead of recomputing
    // the shingle+md5 pipeline per consumer. localCheckpoint, not
    // persist: its blocks are reclaimed when the result is unreferenced,
    // so a library caller can't leak cache across a long session (a
    // round-2 finding against the persist form). At cluster scale this is
    // the table you'd write to storage between stages.
    val sigs = signatures(df, idCol, textCol, n, k).localCheckpoint(true)
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
