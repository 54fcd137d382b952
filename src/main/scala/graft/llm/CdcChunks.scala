package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) dedup at token grain — the
  * shift-robust complement to [[SegmentDedup]]'s FIXED 16-token
  * segments: fixed segmentation breaks when one token is inserted
  * upstream (every later segment re-aligns and nothing matches), while
  * CDC cuts wherever a rolling window hash hits a boundary value
  * (Muthitacharoen et al. 2001, LBFS), so an insertion only perturbs
  * the chunk it lands in and dedup recovers at the next boundary.
  *
  * Boundary rule: a chunk ends after token `i` when the md5 of the
  * k-token window ending at `i` is ≡ 0 (mod `modulus`) — expected
  * chunk length ≈ `modulus` tokens. The rule is STATELESS (a pure
  * property of the window), unlike production CDC's min/max clamps
  * whose boundaries depend on the previous cut — statelessness is what
  * makes every stage a column expression both engines evaluate
  * bit-identically (md5 prefix → BIGINT, the repo-wide idiom).
  *
  * Shapes: map-only gram hashing, one per-doc window prefix-sum (the
  * partition key is the document — parallel across docs, bounded by
  * doc length within), a chunk-grain aggregate, one fingerprint-grain
  * multiplicity aggregate, and fan-out-free equi-joins back. No pair
  * join anywhere: a million-copy boilerplate chunk is ONE fingerprint
  * group, the [[SubstringDedup]] discipline.
  */
object CdcChunks {

  /** Per-chunk table: `idCol, chunk_idx, chunk_start, chunk_end,
    * chunk_tokens, fp` (1-based inclusive token bounds; `fp` is the
    * md5 of the space-joined chunk tokens).
    */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             k: Int = 3, modulus: Int = 8): DataFrame = {
    require(k >= 2, s"k=$k (window of 1 token cuts on vocabulary)")
    require(modulus >= 2, s"modulus=$modulus")
    val toksDf = df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 1)
    // (id, pos, boundary-after-pos?) — positions < k never cut (no full window)
    val pos = toksDf.select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .select(col(idCol), col("__toks"), (col("__p0") + 1L).as("pos"),
        when(col("__p0") + 1L >= k,
          conv(substring(md5(array_join(
            slice(col("__toks"), (col("__p0") + 2L - k).cast("int"), lit(k)),
            " ")), 1, 15), 16, 10).cast("long") % modulus === 0)
          .otherwise(lit(false)).as("__cut"))
    // chunk index = boundaries strictly BEFORE this token (per doc)
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val idx = pos.withColumn("chunk_idx",
      coalesce(sum(when(col("__cut"), 1L).otherwise(0L)).over(wPrev), lit(0L)))
    val bounds = idx.groupBy(col(idCol), col("chunk_idx"))
      .agg(min(col("pos")).as("chunk_start"), max(col("pos")).as("chunk_end"),
        count(lit(1)).as("chunk_tokens"))
    bounds.join(toksDf, Seq(idCol))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        col("chunk_end"), col("chunk_tokens"),
        md5(array_join(slice(col("__toks"), col("chunk_start").cast("int"),
          col("chunk_tokens").cast("int")), " ")).as("fp"))
  }

  /** [[chunks]] as PURE row-local array expressions — no window, no
    * shuffle — so the chunker composes into Structured Streaming
    * (arbitrary non-time windows are unsupported there) and, in batch,
    * runs map-only. Per document: cut positions filter out of one
    * `sequence`, the document end closes the last chunk, and
    * `posexplode` over the ends array yields one row per chunk with
    * the 0-based chunk index equal to the cuts before it — the same
    * numbering [[chunks]]' window prefix-sum produces (asserted
    * equivalent in the spec).
    *
    * The boundary scan is the native
    * [[graft.functions.HashExpressions.CdcCutEnds]] expression, not a
    * `filter(sequence(...), i -> md5(...))` lambda: higher-order
    * functions are CodegenFallback, so the lambda body evaluated one
    * INTERPRETED slice+join+md5 call per token — measured as the whole
    * 6× gap between this chunker and the fixed-segment stream on
    * identical input (BENCH_STREAMING r11). One tight JVM digest loop
    * per row computes bit-identical ends.
    */
  def chunksMapOnly(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3, modulus: Int = 8): DataFrame = {
    require(k >= 2, s"k=$k")
    require(modulus >= 2, s"modulus=$modulus")
    val toksDf = df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 1)
    toksDf.withColumn("__ends",
        graft.functions.HashExpressions.cdcCutEnds(col("__toks"), k, modulus))
      .select(col(idCol), col("__toks"), col("__ends"),
        posexplode(col("__ends")).as(Seq("__j0", "__en")))
      .select(col(idCol), col("__toks"),
        col("__j0").cast("long").as("chunk_idx"),
        when(col("__j0") === 0, lit(1L))
          .otherwise(element_at(col("__ends"), col("__j0")) + 1L)
          .as("chunk_start"),
        col("__en").as("chunk_end"))
      .select(col(idCol), col("chunk_idx"), col("chunk_start"),
        col("chunk_end"),
        (col("chunk_end") - col("chunk_start") + 1L).as("chunk_tokens"),
        md5(array_join(slice(col("__toks"), col("chunk_start").cast("int"),
          (col("chunk_end") - col("chunk_start") + 1L).cast("int")), " "))
          .as("fp"))
  }

  /** Per-document CDC dedup profile: chunk count, chunks whose content
    * occurs at least `minCount` times anywhere in the corpus, and the
    * tokens those duplicated chunks cover. Documents with no tokens
    * report zeros.
    *
    * @return `idCol, n_chunks, dup_chunks, dup_chunk_tokens`
    */
  def dupStats(df: DataFrame, idCol: String, textCol: String,
               k: Int = 3, modulus: Int = 8, minCount: Int = 2): DataFrame = {
    require(minCount >= 2, s"minCount=$minCount")
    val ch = chunks(df, idCol, textCol, k, modulus)
    val dupFp = ch.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minCount).select(col("fp"))
    val perDoc = ch.join(dupFp, Seq("fp"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_chunks"),
        sum(col("chunk_tokens")).as("dup_chunk_tokens"))
    val totals = ch.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
    df.select(col(idCol))
      .join(totals, Seq(idCol), "left")
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("dup_chunks"), lit(0L)).as("dup_chunks"),
        coalesce(col("dup_chunk_tokens"), lit(0L)).as("dup_chunk_tokens"))
  }
}
