package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-document n-gram repetition signals in the style of the Gopher
  * quality filters (Rae et al. 2021, "Scaling Language Models: Methods,
  * Analysis & Insights from Training Gopher", appendix A1.1 — public
  * paper): the character mass concentrated in the single most frequent
  * n-gram (small n flags looped phrases) and the mass in all n-grams
  * occurring more than once (larger n flags boilerplate blocks).
  * Complements [[Curation.dupRatioOf]], which measures token/shingle
  * DIVERSITY; these measure character CONCENTRATION, so a doc repeating
  * one long phrase scores high here even when its token set is broad.
  *
  * Exact definitions (deterministic, engine-agnostic, oracle-checkable):
  * for a document's strict word n-grams (space-joined, none emitted when
  * the doc has fewer than n tokens), with per-gram count `c` and
  * character length `L` (including separators), and total mass
  * `M = Σ c·L` over the doc's grams of that n:
  *
  *  - `top_{n}gram_frac` = (c* · L*) / M where c* is the max count and
  *    L* the longest gram among those with count c* (max-count ties
  *    break toward the larger fraction — one scalar, no arbitrary pick);
  *  - `dup_{n}gram_frac` = Σ_{c ≥ 2} c·L / M.
  *
  * Both divide one exact integer by another in IEEE double, so the
  * results are bit-identical across engines.
  *
  * Scale shape: ALL requested n values ride ONE explode pass (each token
  * array emits its (n, gram) pairs for every n at once), then two
  * aggregations — (doc, n, gram) grain with partial map-side combine,
  * then (doc, n) — and one broadcast-size join back to doc grain. Cost
  * is linear in corpus token count × |ns|; nothing is all-pairs and no
  * state exceeds a doc's gram set.
  */
object Repetition {

  /** Strict n-grams: space-joined windows, EMPTY when the doc has fewer
    * than n tokens (unlike [[Curation.shinglesAll]], which falls back to
    * the whole doc — a repetition denominator must not invent a gram).
    */
  def ngramsStrict(toks: Column, n: Int): Column = {
    require(n >= 1, s"n=$n")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document repetition signals for the requested n values.
    * Output: (idCol, n_tokens, top_{n}gram_frac..., dup_{n}gram_frac...),
    * signal columns in ascending n; docs too short for a given n carry
    * 0.0 (no grams → no repetition evidence).
    */
  def signals(docs: DataFrame, idCol: String, textCol: String,
              topNs: Seq[Int] = Seq(2, 3), dupNs: Seq[Int] = Seq(5)): DataFrame = {
    require(topNs.nonEmpty || dupNs.nonEmpty, "need at least one n")
    val ns = (topNs ++ dupNs).distinct.sorted
    val toksed = docs.select(col(idCol), TextStats.tokens(col(textCol)).as("toks"))

    // one explode carries every n: each row emits its (n, gram) pairs
    val tagged = toksed.select(col(idCol),
      explode(flatten(array(ns.map(n =>
        transform(ngramsStrict(col("toks"), n),
          g => struct(lit(n).as("n"), g.as("gram")))): _*))).as("ng"))

    val grain = tagged
      .groupBy(col(idCol), col("ng.n").as("n"), col("ng.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
      .select(col(idCol), col("n"), col("cnt"),
        length(col("gram")).cast("long").as("glen"))

    // struct max = (max cnt, longest gram among max-count ties)
    val perN = grain.groupBy(col(idCol), col("n")).agg(
      max(struct(col("cnt"), col("glen"))).as("top"),
      sum(col("cnt") * col("glen")).as("total_mass"),
      sum(when(col("cnt") >= 2, col("cnt") * col("glen"))
        .otherwise(lit(0L))).as("dup_mass"))

    val sigCols =
      topNs.distinct.sorted.map(n => round(max(when(col("n") === n,
          (col("top.cnt") * col("top.glen")).cast("double") /
            col("total_mass").cast("double"))), 6)
        .as(s"top_${n}gram_frac")) ++
      dupNs.distinct.sorted.map(n => round(max(when(col("n") === n,
          col("dup_mass").cast("double") / col("total_mass").cast("double"))), 6)
        .as(s"dup_${n}gram_frac"))
    val sigs = perN.groupBy(col(idCol)).agg(sigCols.head, sigCols.tail: _*)

    val sigNames = sigs.columns.filterNot(_ == idCol)
    toksed.select(col(idCol), size(col("toks")).cast("long").as("n_tokens"))
      .join(sigs, Seq(idCol), "left")
      .na.fill(0.0, sigNames)
  }
}
