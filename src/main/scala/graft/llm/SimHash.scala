package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (Charikar-style): a 32-bit signature
  * whose Hamming distance approximates token-multiset cosine distance.
  *
  * Bit j is the majority vote, over all token occurrences, of bit j of
  * the token's hash. The "hash bit" is read from hex nibble j of
  * `md5(token)` (nibble high-bit = value ≥ 8) — chosen over a native
  * integer hash because md5 hex output is bit-identical across engines,
  * making the whole signature exactly oracle-checkable. Pure column
  * expressions: per-document map work, no shuffle, scales linearly.
  */
object SimHash {

  private val HighNibble = Seq("8", "9", "a", "b", "c", "d", "e", "f")

  /** 32-bit simhash of a token array, as a non-negative BIGINT.
    * Evaluated by the native [[graft.functions.HashExpressions.SimHash32]]
    * expression (one fused loop per row); [[simhash32Declarative]] is the
    * bit-identical column-function formulation it was derived from.
    */
  def simhash32(tokens: Column): Column =
    graft.functions.HashExpressions.simhash32(tokens)

  /** Declarative (built-ins only) formulation — same bits as
    * [[simhash32]]; kept as the executable spec.
    */
  def simhash32Declarative(tokens: Column): Column = {
    val hashes = transform(tokens, t => md5(t))
    val bits = (0 until 32).map { j =>
      // vote_j = #tokens with bit set − #tokens with bit clear
      val setCount = size(filter(hashes,
        h => substring(h, j + 1, 1).isin(HighNibble: _*)))
      val vote = setCount * 2 - size(hashes)
      when(vote > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** SimHash near-duplicate pairs: documents whose 32-bit fingerprints
    * differ in at most `maxHamming` bits — the constant-space
    * complement to MinHash banding (one BIGINT per doc instead of a
    * signature row; catches small edits rather than set overlap).
    *
    * Candidates come from 4×8-bit BANDING, the pigeonhole route: with
    * `maxHamming` ≤ 3, at most 3 of the 4 bytes can differ, so every
    * qualifying pair shares at least one exact byte-band — a keyed
    * equi-join on (band, value), never all-pairs. A band bucket
    * holding more than `maxBucket` docs is excluded from candidate
    * generation (the banding analog of the shingle frequency cap: a
    * saturated byte value means that band carries no signal, and its
    * deg² pair fanout would dominate the join) — the cap is part of
    * the operator's CONTRACT, matching the SQL twin bit-for-bit.
    * Survivors verify with the exact popcount.
    *
    * @return (id_a, id_b, hamming) with id_a < id_b
    */
  def nearPairs(docs: DataFrame, idCol: String, textCol: String,
                maxHamming: Int = 3, maxBucket: Int = 200): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming breaks the 4-band pigeonhole guarantee")
    require(maxBucket > 1, s"maxBucket=$maxBucket")
    val fp = docs.select(col(idCol).as("id"),
      simhash32(TextStats.tokens(col(textCol))).as("fp"))
    val bands = fp.select(col("id"), col("fp"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L)).as("v"))
      }: _*)).as("bv"))
      .select(col("id"), col("fp"),
        col("bv.band").as("band"), col("bv.v").as("v"))
    val keep = bands.groupBy(col("band"), col("v"))
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
    val kept = bands.join(keep.select(col("band").as("__b2"),
        col("v").as("__v2")),
      col("band") === col("__b2") && col("v") === col("__v2"))
      .select(col("id"), col("fp"), col("band"), col("v"))
    val cand = kept.select(col("id").as("id_a"), col("fp").as("__fa"),
        col("band"), col("v"))
      .join(kept.select(col("id").as("id_b"), col("fp").as("__fb"),
          col("band").as("__b"), col("v").as("__v")),
        col("band") === col("__b") && col("v") === col("__v") &&
          col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__fa"), col("__fb"))
      .distinct()
    cand.withColumn("hamming", hamming(col("__fa"), col("__fb")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
