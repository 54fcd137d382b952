package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-grain exact deduplication with global first-occurrence
  * keep — the CCNet discipline (Wenzek et al. 2020, "CCNet: Extracting
  * High Quality Monolingual Datasets from Web Crawl Data"): split every
  * document into fixed-grain segments, hash each segment, keep only the
  * FIRST occurrence of each distinct segment corpus-wide, and rebuild
  * each document from its surviving segments. Unlike the span family
  * ([[SubstringDedup]] marks spans, [[graft.llm.Containment]] scores
  * pairs), this operator EDITS the corpus: later copies of a repeated
  * paragraph are deleted while the first copy survives, which is the
  * asymmetric, order-dependent semantics CCNet actually ships.
  *
  * The corpus here has no newline structure, so the segment rule is
  * `w` consecutive tokens (non-overlapping, last segment ragged) — the
  * paragraph analogue at fixture grain; the operator takes the rule as
  * data, nothing downstream depends on it.
  *
  * Scale shape (all grains linear in corpus size, never pairs):
  *
  *   1. SEGMENT is map-only: one `tokens` split, one `transform` over
  *      precomputed slice offsets, one `posexplode` — no token-grain
  *      shuffle, the segment text and its md5 leave the row together;
  *   2. KEEPER is one aggregate at fingerprint grain:
  *      `min(struct(doc, seg_idx))` — partial-aggregatable, so a
  *      boilerplate segment repeated a million times combines map-side
  *      to one row per partition before the shuffle (contrast a
  *      row_number-over-fp window, which would shuffle every
  *      occurrence to one reducer for skewed fingerprints);
  *   3. MARK is an fp-grain equi-join of occurrences to keepers — each
  *      occurrence matches exactly one keeper row, no fan-out; a
  *      hyper-duplicated fingerprint is a skewed JOIN key handled by
  *      AQE skew split, never a pair explosion;
  *   4. REBUILD is a doc-grain aggregate: surviving segments sort by
  *      `seg_idx` inside an `array_sort` (collect order independence)
  *      and re-join with single spaces.
  *
  * Every value is exact (md5 hex, integer counts), so the whole edit is
  * oracle-checkable bit-for-bit.
  */
object SegmentDedup {

  /** `(idCol, seg_idx, seg_fp)`: md5 hex of each non-overlapping
    * `w`-token segment, `seg_idx` 0-based in document order. Documents
    * with no tokens emit nothing. The segment fingerprint hashes the
    * space-rejoined token slice, so trailing-whitespace and
    * multi-space differences do not split fingerprints (same
    * normalization as the shingle family).
    */
  def segments(df: DataFrame, idCol: String, textCol: String,
               w: Int): DataFrame = {
    require(w >= 2, s"w=$w — 1-token segments dedup the vocabulary, not text")
    df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol),
        expr(
          s"""posexplode(transform(
             |  sequence(0, cast(ceil(size(__toks) / cast($w as double)) as int) - 1),
             |  i -> md5(array_join(slice(__toks, i * $w + 1, $w), ' '))))"""
            .stripMargin).as(Seq("seg_idx", "seg_fp")))
  }

  /** Occurrences annotated with the corpus-wide keep decision:
    * `(idCol, seg_idx, seg_fp, kept)` where `kept` is true iff this
    * occurrence is the lexicographically-first `(doc, seg_idx)` for its
    * fingerprint. Exactly one occurrence per distinct fingerprint is
    * kept — the CCNet "first writer wins" rule, deterministic for any
    * partitioning because the keeper is a total-order min.
    */
  def keepFirst(segs: DataFrame, idCol: String): DataFrame = {
    val keepers = segs
      .groupBy(col("seg_fp"))
      .agg(min(struct(col(idCol), col("seg_idx"))).as("__keeper"))
    segs.join(keepers, "seg_fp")
      .select(col(idCol), col("seg_idx"), col("seg_fp"),
        (col("__keeper")(idCol) === col(idCol) &&
          col("__keeper")("seg_idx") === col("seg_idx")).as("kept"))
  }

  /** Document-grain edit summary for every document that LOST at least
    * one segment: `(idCol, n_segs, n_removed, kept_fp)` where `kept_fp`
    * is the md5 of the surviving segments' fingerprints re-joined in
    * segment order (a compact, order-sensitive digest of the edited
    * document — two engines agree on it iff they kept exactly the same
    * segments in the same order). Rebuilding the actual text is the
    * same aggregate with `seg_text` carried instead of `seg_fp`; the
    * digest form keeps the certified output at stats width.
    */
  def docStats(df: DataFrame, idCol: String, textCol: String,
               w: Int): DataFrame = {
    val marked = keepFirst(segments(df, idCol, textCol, w), idCol)
    marked.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"),
        md5(array_join(
          transform(
            array_sort(collect_list(
              when(col("kept"), struct(col("seg_idx"), col("seg_fp"))))),
            s => s("seg_fp")),
          " ")).as("kept_fp"))
      .where(col("n_removed") > 0)
  }
}
