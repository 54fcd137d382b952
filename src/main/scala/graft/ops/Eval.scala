package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-evaluation aggregates — the scoring half of a training-
  * data pipeline's model loop: per-class precision/recall/F1, chance-
  * corrected agreement (Cohen's κ) between two labelers (annotator vs
  * model, judge vs judge), and threshold-free ranking quality (ROC AUC
  * as the Mann-Whitney statistic). At corpus scale these run as
  * aggregates over label/score GRIDS, never row-grain sorts.
  *
  * Determinism: every count is an exact long; the only doubles are
  * closed-form ratios at the end (6-decimal rounded). AUC's rank math
  * stays on a half-integer grid (binary fractions — exactly
  * representable), so even its sums are bit-exact.
  */
object Eval {

  /** Per-class one-vs-rest confusion stats for a multi-class predictor:
    * `clazz, n_actual, n_predicted, tp, precision, recall, f1` — one
    * row per class appearing on EITHER side (a class the model never
    * predicts still shows, with null precision; an hallucinated class
    * shows with null recall).
    *
    * Scale shape: one (actual, predicted) pair-grain aggregate — the
    * confusion matrix, ≤ classes² rows — then class-grain folds of that
    * tiny grid. One data shuffle total.
    */
  def classStats(df: DataFrame, actual: Column, predicted: Column)
    : DataFrame = {
    val cm = df.select(actual.cast("string").as("__a"),
        predicted.cast("string").as("__p"))
      .where(col("__a").isNotNull && col("__p").isNotNull)
      .groupBy(col("__a"), col("__p")).agg(count(lit(1)).as("__n"))
    val act = cm.groupBy(col("__a").as("clazz"))
      .agg(sum(col("__n")).as("n_actual"),
        sum(when(col("__p") === col("__a"), col("__n")).otherwise(0L))
          .as("tp"))
    val pred = cm.groupBy(col("__p").as("clazz"))
      .agg(sum(col("__n")).as("n_predicted"))
    act.join(pred, Seq("clazz"), "full_outer")
      .select(col("clazz"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_predicted"), lit(0L)).as("n_predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision",
        when(col("n_predicted") > 0L,
          round(col("tp").cast("double") / col("n_predicted").cast("double"), 6)))
      .withColumn("recall",
        when(col("n_actual") > 0L,
          round(col("tp").cast("double") / col("n_actual").cast("double"), 6)))
      .withColumn("f1",
        // defined (as 0.0) whenever both denominators exist — a null at
        // tp=0 would let macro-F1 averages silently skip the worst classes
        when(col("n_predicted") > 0L && col("n_actual") > 0L,
          round(lit(2.0) * col("tp").cast("double") /
            (col("n_predicted") + col("n_actual")).cast("double"), 6)))
  }

  /** Cohen's κ between two label columns, one row:
    * `n, po, pe, kappa` — observed agreement, chance agreement from the
    * marginals, and the chance-corrected score (κ=1 perfect, 0 chance
    * level, <0 worse than chance). Null κ when pe=1 (both sides
    * constant and equal — agreement is unfalsifiable).
    *
    * Scale shape: the same confusion-grid aggregate as [[classStats]];
    * marginal products fold over ≤ classes² rows.
    */
  def cohenKappa(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cm = df.select(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
    val rowT = cm.groupBy(col("__a")).agg(sum(col("__n")).as("__ra"))
    val colT = cm.groupBy(col("__b")).agg(sum(col("__n")).as("__cb"))
    // chance agreement: Σ_c rowMarginal(c)·colMarginal(c) — exact in
    // decimal(38,0) (marginal products pass long range once n > ~3e9)
    import Exact.d38
    val chance = rowT.join(colT, col("__a") === col("__b"))
      .agg(coalesce(sum(d38(col("__ra")) * d38(col("__cb"))), d38(lit(0L)))
        .as("__pe_num"))
    val agree = cm.agg(sum(col("__n")).as("__n_tot"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .as("__n_agree"))
    val n = col("__n_tot").cast("double")
    val po = col("__n_agree").cast("double") / n
    val pe = col("__pe_num").cast("double") / (n * n)
    agree.crossJoin(broadcast(chance))
      .select(col("__n_tot").as("n"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        when(pe =!= 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Mutual information between two categorical columns, one row:
    * `n, mi, nmi` — how much knowing one tells you about the other, in
    * nats, with the sqrt-normalized variant in [0,1] for comparing
    * column pairs (the feature-selection/leakage screen: a "random"
    * split column with high NMI against the label is a red flag).
    * `nmi` is null when either side is constant (zero entropy).
    *
    * Scale shape: the [[classStats]] confusion-grid aggregate; MI and
    * the entropies fold over ≤ classes² cells — the tiny-grid double
    * sum ([[Stats.chiSquare]] residual), 6-decimal rounded.
    */
  def mutualInformation(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cm = df.select(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
    val rowT = cm.groupBy(col("__a")).agg(sum(col("__n")).as("__ra"))
    val colT = cm.groupBy(col("__b")).agg(sum(col("__n")).as("__cb"))
    val tot = cm.agg(sum(col("__n")).as("__t"))
    def entropy(cnt: String): Column = {
      val p = col(cnt).cast("double") / col("__t").cast("double")
      sum(-p * log(p))
    }
    val ha = rowT.crossJoin(broadcast(tot)).agg(entropy("__ra").as("__ha"))
    val hb = colT.crossJoin(broadcast(tot)).agg(entropy("__cb").as("__hb"))
    val n = col("__t").cast("double")
    val pab = col("__n").cast("double") / n
    val term = pab * log(col("__n").cast("double") * n /
      (col("__ra").cast("double") * col("__cb").cast("double")))
    cm.join(rowT, "__a").join(colT, "__b").crossJoin(broadcast(tot))
      .agg(max(col("__t")).as("n"), sum(term).as("__mi"))
      .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("n"), round(col("__mi"), 6).as("mi"),
        when(col("__ha") > 0.0 && col("__hb") > 0.0,
          round(col("__mi") / sqrt(col("__ha") * col("__hb")), 6))
          .as("nmi"))
  }

  /** ROC AUC as the Mann-Whitney U statistic over an INTEGER score:
    * the probability a random positive outscores a random negative
    * (ties count half). One row: `n_pos, n_neg, auc`.
    *
    * Computed at score-GRID grain: counts per distinct score, a
    * cumulative window over the grid, then
    * `U = Σ_s pos_s · (negBelow_s + neg_s/2)` — the rank formulation
    * without ranking any row. The grid is bounded by distinct score
    * values (the caller scores at integer grain, e.g. cents), so the
    * window runs over thousands of rows, not the corpus; every term is
    * a half-integer (exact in binary), making the sum bit-exact.
    */
  def aucMannWhitney(df: DataFrame, score: Column, label: Column)
    : DataFrame = {
    val grid = df.select(score.cast("long").as("__s"),
        label.cast("boolean").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("__neg"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val negBelow = coalesce(sum(col("__neg")).over(w), lit(0L))
    grid
      .select(col("__pos"), col("__neg"),
        (col("__pos").cast("double") *
          (negBelow.cast("double") + col("__neg").cast("double") / 2.0))
          .as("__u"))
      .agg(sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        when(sum(col("__pos")) > 0L && sum(col("__neg")) > 0L,
          round(sum(col("__u")) /
            (sum(col("__pos")).cast("double") *
              sum(col("__neg")).cast("double")), 6)).as("auc"))
  }

  /** Truncated rank-biased overlap weights at persistence `p`, depth
    * `k`, on the shared nano grid: W[m] is what ONE item appearing at
    * max(rankA, rankB) = m contributes to RBO@k, i.e.
    * (1−p)·Σ_{d=m..k} p^(d−1)/d. Pure Scala, so the Spark expression
    * and a SQL twin can embed bit-identical literals.
    */
  def rboWeightsNano(p: Double, k: Int): Seq[Long] =
    (1 to k).map { m =>
      val w = (1 - p) * (m to k).map(d => math.pow(p, d - 1) / d).sum
      math.round(w * 1e9)
    }

  /** Rank-biased overlap@k (Webber et al.) between two per-query
    * rankings — the top-weighted agreement measure for comparing an ANN
    * index's output against the exact ranking: RBO@k =
    * (1−p)·Σ_{d=1..k} p^(d−1)·|A_1..d ∩ B_1..d|/d, with p the
    * persistence (p=0.9 ≈ "the user looks ~10 deep").
    *
    * Instead of materializing the k prefix depths, each item present in
    * BOTH rankings contributes the closed-form tail weight
    * W[max(ra, rb)] exactly once — a (query, item) equi-join, one
    * weight lookup, one keyed sum. The weights sum as exact nanos so
    * the per-query total is order-independent; the /1e9 at the end is
    * one double division rounded to 6 decimals.
    *
    * Queries with zero overlap emit rbo = 0 (left join from `rankA`'s
    * query set). Both inputs must be at (query, item) grain with ranks
    * 1..k; rows ranked beyond `k` are ignored.
    *
    * Scale shape: broadcast-sized weight array, one equi-join at
    * ranking grain (|Q|·k rows per side), one query-grain aggregate —
    * nothing touches corpus grain.
    */
  def rbo(rankA: DataFrame, rankB: DataFrame, queryCol: String,
          itemCol: String, rankCol: String, p: Double = 0.9,
          k: Int = 10): DataFrame = {
    require(p > 0 && p < 1 && k >= 1, s"p=$p k=$k")
    val wNano = rboWeightsNano(p, k)
    val a = rankA.select(col(queryCol).as("query_id"),
      col(itemCol).as("__item"), col(rankCol).cast("int").as("__ra"))
      .where(col("__ra") <= k)
    val b = rankB.select(col(queryCol).as("query_id"),
      col(itemCol).as("__item"), col(rankCol).cast("int").as("__rb"))
      .where(col("__rb") <= k)
    val qs = a.select(col("query_id")).distinct()
    val matched = a.join(b, Seq("query_id", "__item"))
      .withColumn("__w", element_at(
        array(wNano.map(lit): _*), greatest(col("__ra"), col("__rb"))))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_common"), sum(col("__w")).as("__wsum"))
    qs.join(matched, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("__wsum"), lit(0L)).cast("double") / 1e9, 6)
          .as("rbo"))
  }

  /** Calibration (reliability) curve for a micro-scaled score in
    * [0, 1e6] against a boolean outcome: equal-WIDTH score bins, per
    * bin the observed positive rate next to the mean predicted score.
    * A well-calibrated quality/language classifier tracks the
    * diagonal; the table is the standard evidence either way.
    *
    * Equal-width bins (score div (1e6/nBins), top edge clamped into
    * the last bin) rather than ntile deciles ON PURPOSE: ntile is a
    * GLOBAL data-grain sort — the one-task window that dies at corpus
    * scale — while width binning is map-only and the bin populations
    * still expose miscalibration. Counts and score sums aggregate as
    * exact integers; the two rates are one rounded double each at the
    * end.
    */
  def calibrationCurve(df: DataFrame, scoreMicro: Column, label: Column,
                       nBins: Int = 10): DataFrame = {
    require(nBins > 0 && 1000000 % nBins == 0, s"nBins=$nBins")
    val width = 1000000L / nBins
    val clamped = greatest(scoreMicro, lit(0L))
    // non-negative integer division in the exact pmod form (a bare `/`
    // on longs is double division in Spark SQL)
    val bin = least(((clamped - pmod(clamped, lit(width))) / lit(width))
      .cast("long"), lit(nBins - 1L))
    df.select(bin.as("bin"), scoreMicro.as("__s"),
        when(label, 1L).otherwise(0L).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__s")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        round(col("__ssum").cast("double") / col("n").cast("double") / 1e6,
          6).as("mean_score"))
  }
}
