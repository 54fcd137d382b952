package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID, and
  * document fingerprinting. (Extension surface beyond the reference —
  * SURVEY.md §7.2 step 6; the reference's own text handling stops at
  * null-token normalization, dags/pdq_etl_dag.py:149-158.)
  *
  * Everything is a pure Catalyst column expression (no UDFs): codegen'd,
  * partition-parallel, shuffle-free — per-document map work that scales
  * linearly at 100 TB. Hash-based ops use `md5`, which is bit-identical
  * across engines, so results are exactly oracle-checkable.
  */
object TextStats {

  /** The whitespace class every tokenizer/normalizer shares, EXPLICIT
    * instead of `\s` because the engines' regex dialects disagree on
    * it: Java regex (Spark) includes vertical tab U+000B in `\s`, RE2
    * (the DuckDB twins) does not. The literal is valid in both
    * dialects, so the SQL oracles interpolate THIS string — one
    * definition of "whitespace" repo-wide.
    */
  val WsRegex = "[ \\t\\n\\x0B\\f\\r]+"

  /** Whitespace tokens, empties dropped (split-then-filter keeps the
    * semantics identical across engines regardless of how each handles
    * leading/trailing separators).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), WsRegex), t => t =!= "")

  /** Whitespace token count. */
  def nTokens(text: Column): Column = size(tokens(text)).cast("long")

  /** Token count over a pre-materialized token-array column. */
  def nTokensOf(toks: Column): Column = size(toks).cast("long")

  /** BPE-ish word-piece count: runs of letters, runs of digits, or single
    * other non-space chars — a cheap deterministic proxy for subword
    * token counts. Counted natively ([[graft.functions.RegexpCount]],
    * codegen'd) instead of materializing the `regexp_extract_all` array
    * just to take its size.
    */
  def nWordPieces(text: Column): Column =
    graft.functions.RegexpCount.regexpCount(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  /** Punctuation chars / total chars (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    val p = graft.functions.RegexpCount.regexpCount(text, "[.,;:!?'\"()\\[\\]{}-]")
    when(n > 0, p.cast("double") / n.cast("double")).otherwise(lit(0.0))
  }

  /** Mean token length (0 for empty text). */
  def avgTokenLen(text: Column): Column = avgTokenLenOf(tokens(text))

  /** [[avgTokenLen]] over a pre-materialized token-array column. Pass an
    * ATTRIBUTE (a column materialized by a projection), not the raw
    * `tokens(text)` expression: higher-order functions re-evaluate captured
    * non-attribute expressions per element (see [[tokensOnce]]).
    */
  def avgTokenLenOf(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))

  /** English stopwords used by the ratio/language heuristics. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Fraction of tokens found in `stopwords` (case-insensitive). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnStopwords): Column =
    stopwordRatioOf(tokens(text), stopwords)

  /** [[stopwordRatio]] over a pre-materialized token-array column. */
  def stopwordRatioOf(toks: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    when(size(toks) > 0,
      size(filter(toks, t => array_contains(sw, lower(t)))).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, nonzero stopword mass — the standard cheap pre-filter
    * shape for web-scale corpora (cf. C4/Gopher-style heuristics).
    */
  def qualityScore(text: Column): Column =
    qualityScoreOf(nTokens(text), punctRatio(text), stopwordRatio(text))

  /** [[qualityScore]] composed from already-computed stat columns — the
    * tokenize-once path: compute `n_tokens`/`punct_ratio`/`stopword_ratio`
    * in one projection and feed the attributes here, so the document is
    * tokenized once instead of once per stat (at corpus scale that is one
    * vs ~10 regex passes over every document).
    */
  def qualityScoreOf(nTokens: Column, punctRatio: Column,
                     stopwordRatio: Column): Column = {
    val lenScore = least(nTokens.cast("double") / lit(64.0), lit(1.0))
    val punctOk = when(punctRatio < 0.2, lit(1.0)).otherwise(lit(0.5))
    val swOk = when(stopwordRatio > 0.05, lit(1.0)).otherwise(lit(0.5))
    lenScore * lit(0.5) + punctOk * lit(0.25) + swOk * lit(0.25)
  }

  // ----- readability (Flesch) -------------------------------------------

  /** Syllable-count proxy: maximal vowel runs (`y` counted as a vowel),
    * case-insensitive — the standard dictionary-free heuristic ("beautiful"
    * → eau+i+u = 3). Counted natively, no array materialization.
    */
  def nSyllables(text: Column): Column =
    graft.functions.RegexpCount.regexpCount(lower(text), "[aeiouy]+")

  /** Sentence-count proxy: maximal terminal-punctuation runs ("What?!"
    * is one boundary), floored at 1 for any non-empty text so ratios
    * stay defined for fragments without a terminator.
    */
  def nSentences(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L)).otherwise(
      greatest(graft.functions.RegexpCount.regexpCount(text, "[.!?]+"), lit(1L)))

  /** Flesch reading ease from pre-aggregated EXACT long moments
    * (Σ words, Σ sentences, Σ syllables):
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` —
    * closed-form double arithmetic at the end, the [[graft.ops.Trend]]
    * determinism discipline. Null when either denominator is zero.
    * Feeding one document's moments gives its score; feeding a GROUP'S
    * summed moments gives the corpus-level score (the length-weighted
    * form — NOT the mean of per-document scores, which would overweight
    * fragments).
    */
  def fleschOf(nWords: Column, nSentences: Column, nSyllables: Column): Column =
    when(nSentences > 0L && nWords > 0L,
      round(lit(206.835) -
        lit(1.015) * nWords.cast("double") / nSentences.cast("double") -
        lit(84.6) * nSyllables.cast("double") / nWords.cast("double"), 6))

  /** Tiny per-language stopword sets for the n-gram/stopword language-ID
    * heuristic (deterministic, dictionary-free).
    */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "para", "en", "que"))

  /** Language-ID: argmax of per-language stopword hit counts; `und`
    * (undetermined) when no list scores a hit. Ties break by language
    * code order for determinism.
    */
  def langId(text: Column): Column = langPredOf(langHits(tokens(text)))

  /** Per-language stopword hit counts over a token-array column, in
    * language-code order. Materialize these as columns in a projection and
    * feed the attributes to [[langPredOf]] — the tokenize-once path (the
    * inline [[langId]] re-evaluates the token split per language filter
    * AND per `greatest`/`when` reference, ~12 tokenizations per row).
    */
  def langHits(toks: Column): Seq[(String, Column)] =
    LangStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val sw = array(words.map(lit): _*)
      lang -> size(filter(toks, t => array_contains(sw, lower(t))))
    }

  /** Argmax of per-language hit counts; `und` when no list scores a hit.
    * Ties break by language code order for determinism.
    */
  def langPredOf(hits: Seq[(String, Column)]): Column = {
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und")) { case ((lang, sc), els) =>
      when(sc > 0 && sc === best, lit(lang)).otherwise(els)
    }
  }

  /** Canonical text for exact-dup detection: lowercase, collapse
    * whitespace, strip leading/trailing space.
    */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), WsRegex, " "))

  /** Content fingerprint: md5 of the normalized text (exact-dup key). */
  def fingerprint(text: Column): Column = md5(normalizedText(text))

  /** Rolling polynomial fingerprint over the token stream
    * (Rabin-Karp-shaped: acc = acc*31 + h(token) mod 2^31-1, h from the
    * md5 hex prefix). Order-sensitive — unlike [[fingerprint]] it
    * distinguishes permuted documents; unlike a raw md5 it can be
    * computed incrementally over appended chunks. Pinned by unit test;
    * no DuckDB twin (the sequential mod-fold has no clean SQL form —
    * hex→int itself IS portable, see [[winnowFingerprints]]'s oracle).
    */
  def rollingFingerprint(tokens: Column): Column =
    aggregate(
      transform(tokens, t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")),
      lit(0L),
      (acc, h) => pmod(acc * 31 + h, lit(2147483647L)))

  /** Shannon entropy (nats) of the token distribution, over a
    * pre-materialized token-array ATTRIBUTE (the tokenize-once rule —
    * see [[avgTokenLenOf]]). Low entropy flags repetitive/templated
    * text that length and punctuation ratios miss (a 10k-token page of
    * one repeated word scores ~0); the standard cheap repetition signal
    * next to [[graft.llm.Curation.dupRatioOf]]'s shingle ratios.
    *
    * Map-only by construction: computed per row from the array via
    * `entropy = ln(n) - (Σ c·ln c)/n` over distinct-token counts — no
    * explode, no (doc, token) shuffle. Rounded to 6 decimals so the
    * DuckDB oracle's libm/fold-order ulps cannot surface.
    */
  def tokenEntropyOf(toks: Column): Column = {
    val n = size(toks).cast("double")
    val sumClnC = aggregate(
      transform(array_distinct(toks),
        t => size(filter(toks, x => x === t)).cast("double")),
      lit(0.0),
      (acc, c) => acc + c * log(c))
    when(size(toks) > 0, round(log(n) - sumClnC / n, 6)).otherwise(lit(0.0))
  }

  /** Positions fit in 20 bits of the packed (hash, position) selection
    * key — up to ~1M k-grams per document. Larger documents should be
    * chunked first ([[graft.llm.Curation.chunkTokens]]).
    */
  val WinnowPosCap: Long = 1L << 20

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — the MOSS sketch). Every window of `w` consecutive
    * k-gram hashes contributes its minimum, so any shared token span of
    * at least `w + k - 1` tokens between two documents is GUARANTEED to
    * share a selected fingerprint — the local, position-aware near-dup
    * sketch that MinHash (global, order-blind) cannot provide.
    *
    * Spark-first shape: k-grams and their hashes are a per-row map stage
    * (`transform` over the token array, no shuffle); the window minimum
    * is one shuffle on the document id with a linear per-doc pass; the
    * selection dedup collapses w-fold overlap before anything else moves.
    * At corpus scale the output is ~2/(w+1) of the k-gram stream
    * (the expected winnowing density) keyed for a fingerprint-grain
    * equi-join — the same never-all-pairs discipline as the LSH path.
    *
    * Hashes are the integer value of the first 10 md5 hex chars of the
    * k-gram (40 bits — bit-identical across engines, so the whole
    * operator is exactly oracle-checkable). Selection ties break (hash,
    * position)-lexicographic via a single packed long `h * 2^20 + pos`.
    *
    * Documents shorter than `w + k - 1` tokens have no full window and
    * emit no fingerprints (the standard winnowing domain; guard-rail
    * callers should pre-filter or chunk).
    *
    * @return one row per selected (document, position): `idCol`,
    *         `pos` (1-based k-gram position, long), `fp` (40-bit hash)
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k=$k")
    require(w >= 1, s"w=$w")
    val grams = df
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= k)
      // per-doc gram count is known BEFORE the explode (size − k + 1):
      // carried as a column, it saves a count-window pass over the
      // exploded corpus. It MUST materialize in its own projection
      // below the explode — an expression sharing a select with a
      // generator evaluates after generation, which would force the
      // whole token array into every generated row (quadratic bytes;
      // caught live on the 1M-token guard fixture).
      .select(col(idCol),
        (size(col("__toks")) - lit(k - 1)).cast("long").as("__ng"),
        col("__toks"))
      .select(col(idCol), col("__ng"),
        // native per-window digest loop (bit-identical to the
        // declarative transform-lambda, which is interpreted per
        // window under CodegenFallback HOFs)
        explode(graft.functions.HashExpressions
          .windowGramHashes(col("__toks"), k, 10)).as("g"))
      .select(col(idCol), col("__ng"), col("g.pos").as("pos"),
        // a position past the cap would silently alias into another
        // (hash, pos) key and corrupt selections — fail loudly instead
        when(col("g.pos") >= lit(WinnowPosCap),
          raise_error(concat(lit("winnowFingerprints: document exceeds "),
            lit(WinnowPosCap), lit(" k-grams — chunk it first (Curation.chunkTokens)"))))
          .otherwise(col("g.h") * lit(WinnowPosCap) + col("g.pos"))
          .as("__combined"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val sel = min(col("__combined"))
      .over(byDoc.rowsBetween(Window.currentRow, w - 1))
    grams
      .select(col(idCol), col("pos"), col("__ng"), sel.as("__sel"))
      .where(col("pos") <= col("__ng") - (w - 1))
      .select(col(idCol), col("__sel"))
      .distinct()
      .select(col(idCol),
        (col("__sel") % lit(WinnowPosCap)).as("pos"),
        expr(s"__sel div ${WinnowPosCap}").as("fp"))
  }
}
