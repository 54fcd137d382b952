package graft.llm

import org.apache.spark.sql.Column
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
}
