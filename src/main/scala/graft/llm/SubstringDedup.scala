package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level duplicate detection: find the MAXIMAL token spans of
  * each document that also occur (as an exact w-token substring) in
  * other documents — the "dedup the repeated passage, not the whole
  * document" operator from Lee et al. 2022 ("Deduplicating Training
  * Data Makes Language Models Better"), whose suffix-array span removal
  * is the step beyond document-grain MinHash/SimHash: two documents can
  * be globally dissimilar yet share a verbatim boilerplate paragraph or
  * licence block that a trained model will memorize.
  *
  * Spark-first shape instead of the paper's suffix array (pointer-
  * chasing over one giant in-memory array — the opposite of a
  * distributed plan):
  *
  *   1. per-position w-token shingle hashes — map-only, the
  *      [[TextStats.winnowFingerprints]] gram idiom;
  *   2. duplicated shingles = `count_distinct(doc) >= minDocs` at
  *      SHINGLE grain — one keyed aggregate, partial-pushed; a
  *      boilerplate shingle shared by a million documents is one group
  *      with a big count, never a pair join;
  *   3. mark duplicated positions with an h-grain equi-join back —
  *      each position matches AT MOST ONE shingle group, so the join
  *      CANNOT fan out (contrast every pair-generating dedup path,
  *      which needs frequency caps — this one is linear by
  *      construction);
  *   4. merge overlapping/adjacent duplicated windows into maximal
  *      spans — one per-doc window pass (gaps-and-islands, the
  *      [[graft.ops.Intervals]] discipline).
  *
  * Every stage is a column expression over md5 (bit-identical across
  * engines), so span boundaries are exactly oracle-checkable. A 60-bit
  * hash collision could mark a span duplicated spuriously
  * (~2⁻⁶⁰ per shingle pair sharing a bucket — negligible; the paper's
  * suffix array is exact but single-machine).
  */
object SubstringDedup {

  /** `(idCol, pos, h)`: the 60-bit hash of the w-token shingle starting
    * at each 1-based token position. Documents shorter than `w` tokens
    * emit nothing.
    */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String,
                    w: Int): DataFrame = {
    require(w >= 2, s"w=$w — a 1-token 'substring' is a vocabulary, not a span")
    // native per-window digest loop, bit-identical to the declarative
    // explode(transform(..., i -> md5(slice))) — which paid one
    // INTERPRETED lambda per window (HOFs are CodegenFallback); this is
    // the exact-substring family's hottest path at corpus scale
    df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= w)
      .select(col(idCol),
        explode(graft.functions.HashExpressions
          .windowGramHashes(col("__toks"), w, 15)).as("g"))
      .select(col(idCol), col("g.pos").as("pos"), col("g.h").as("h"))
  }

  /** Maximal cross-document duplicated token spans: one row per
    * `(document, span)` with 1-based inclusive token bounds. A position
    * is duplicated when its w-gram occurs in at least `minDocs`
    * DISTINCT documents; runs of duplicated positions closer than `w`
    * tokens merge (their w-windows overlap or touch).
    *
    * @return `idCol, span_start, span_end, span_tokens`
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               w: Int = 5, minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs — 1 would flag every token")
    val grams = shingleHashes(df, idCol, textCol, w)
    val dupShingles = grams.groupBy(col("h"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("h"))
    val dupPos = grams.join(dupShingles, "h")
      .select(col(idCol), col("pos"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val withPrev = dupPos
      .withColumn("__prev", lag(col("pos"), 1).over(byDoc))
    val islands = withPrev
      .withColumn("__new",
        when(col("__prev").isNull || col("pos") - col("__prev") > w, 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islands.groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(w - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"))
  }

  /** The Lee et al. EDIT itself — remove every LATER occurrence of a
    * repeated w-gram span and keep the first, then rebuild the
    * documents: the step beyond [[dupSpans]]'s marking, with the
    * asymmetric first-writer-wins semantics of [[SegmentDedup]] applied
    * at SLIDING-window grain (segments are non-overlapping and
    * re-alignable; this removes the span wherever it re-appears,
    * including inside the same document).
    *
    * Corpus order is `(idCol, pos)`; the keeper of a w-gram is its
    * minimal `(idCol, pos)` occurrence — one partial-aggregatable
    * `min(struct(...))` at gram-hash grain, never a window over
    * occurrences. Later occurrences mark `[pos, pos+w)`; overlapping
    * marks merge per document (gaps-and-islands); surviving tokens
    * rebuild by position. Output is stats width — the rebuilt text is
    * certified by md5 so the oracle hash pins every byte without
    * shipping the text.
    *
    * @return `idCol, n_tokens, removed_tokens, kept_tokens, kept_md5`
    *         (kept_md5 = md5 of the space-joined surviving tokens;
    *         md5('') for fully-removed or empty docs)
    */
  def firstOccurrenceRebuild(df: DataFrame, idCol: String, textCol: String,
                             w: Int = 5): DataFrame = {
    val grams = shingleHashes(df, idCol, textCol, w)
    val keepers = grams.groupBy(col("h"))
      .agg(min(struct(col(idCol), col("pos"))).as("__k"))
    // each occurrence matches exactly ONE keeper row (no fan-out); a
    // later occurrence is any (doc, pos) above the keeper's
    val later = grams.join(keepers, Seq("h"))
      .where(struct(col(idCol), col("pos")) =!= col("__k"))
      .select(col(idCol), col("pos"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val islands = later
      .withColumn("__prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("__new",
        when(col("__prev").isNull || col("pos") - col("__prev") > w, 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__new")).over(
          byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val spans = islands.groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).as("__st"), (max(col("pos")) + lit(w - 1)).as("__en"))
    val marked = spans.select(col(idCol),
      explode(sequence(col("__st"), col("__en"))).as("pos"))
    val toks = df.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .select(col(idCol), (col("__p0") + 1L).as("pos"), col("__tok"))
    val kept = toks.join(marked, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("kept_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("__tok")))),
          x => x.getField("__tok")), " ")).as("kept_md5"))
    df.select(col(idCol), TextStats.nTokens(col(textCol)).as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_md5"), lit(md5Empty)).as("kept_md5"))
  }

  private val md5Empty = "d41d8cd98f00b204e9800998ecf8427e" // md5("")

  /** Per-document duplication profile over ALL documents (clean ones
    * included): `idCol, n_tokens, dup_tokens, dup_ratio` — the gating
    * column a curation pipeline thresholds on ("drop documents that are
    * mostly duplicated passages", the paper's NearDup+ExactSubstr
    * combination).
    */
  def dupStats(df: DataFrame, idCol: String, textCol: String,
               w: Int = 5, minDocs: Int = 2): DataFrame = {
    val perDoc = dupSpans(df, idCol, textCol, w, minDocs)
      .groupBy(col(idCol))
      .agg(sum(col("span_tokens")).as("__dup"))
    df.select(col(idCol), TextStats.nTokens(col(textCol)).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("__dup"), lit(0L)).cast("double") /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 6)
          .as("dup_ratio"))
  }
}
