package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stupid Backoff — the distributed n-gram language model (Brants et
  * al. 2007, "Large Language Models in Machine Translation"): raw-count
  * trigram scores with a fixed 0.4 back-off penalty instead of
  * normalized discounting, BECAUSE the whole point is that training is
  * nothing but three n-gram-grain counting aggregates — the design
  * Google built for MapReduce-scale corpora, and the natural step past
  * [[LangModel]]'s broadcastable char-bigram model: here the model is
  * DATA-GRAIN (a 100 TB corpus yields billions of distinct trigrams),
  * so scoring joins the position stream to the count tables on n-gram
  * keys rather than broadcasting anything.
  *
  * Score of token w with context (w2, w1), counts c from the TRAIN
  * slice ("start level" = min(position, 3)):
  *   - trigram hit:             S = c(w2 w1 w) / c(w2 w1)
  *   - back off to bigram:      S = 0.4 · c(w1 w) / c(w1)
  *   - back off to unigram:     S = 0.4² · (c(w)+1) / (N+V)
  * Positions 1 and 2 start lower (no context): position 1 scores at the
  * unigram level with NO penalty, position 2 starts at the bigram
  * level. The unigram level is add-one smoothed over the train
  * vocabulary V so out-of-vocabulary held-out tokens stay finite —
  * the one smoothing in the model, applied at the unigram level only
  * (trigram/bigram hits are raw ratios, per the paper).
  *
  * Scale shape: training = three groupBy-count aggregates over the
  * train position stream (map-side combinable). Scoring = THREE
  * n-gram-grain equi-joins against prefix-fused count tables (each
  * level's prefix count rides its n-gram table via a model-grain join —
  * legal because the formula reads a prefix count only when the longer
  * n-gram hit, and a hit implies the prefix exists) + one 1-row (N, V)
  * broadcast, then one doc-grain sum. No model broadcast, no windows,
  * no self-joins.
  *
  * Cross-engine exactness: each position's ln(S) is rounded ONCE to
  * integer nano-units — S is a product of a decimal-literal penalty
  * factor (1.0 / 0.4 / 0.16, identical doubles in every IEEE engine)
  * and one BIGINT/BIGINT double division, so the double chain is
  * short and identical on both engines; per-document sums are then
  * BIGINT-exact and order-invariant.
  */
object StupidBackoff {

  /** The `(doc, position, w, w1, w2)` stream: 1-based position `i`,
    * token `w`, previous token `w1` (null at i=1), the one before `w2`
    * (null at i≤2) — built inside the token array (no window), then
    * exploded.
    */
  def positions(docs: DataFrame, idCol: String,
                textCol: String): DataFrame =
    docs.select(col(idCol), TextStats.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 1)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__toks"))), i =>
          struct(i.cast("int").as("i"),
            element_at(col("__toks"), i).as("w"),
            when(i >= 2, element_at(col("__toks"), i - 1)).as("w1"),
            when(i >= 3, element_at(col("__toks"), i - 2)).as("w2"))))
          .as("__p"))
      .select(col(idCol), col("__p.i").as("i"), col("__p.w").as("w"),
        col("__p.w1").as("w1"), col("__p.w2").as("w2"))

  /** Per-position scores over the held-out stream, against counts from
    * the train stream. Returns the held-out stream plus `lvl` (3/2/1 —
    * the level that fired) and `lp_nano` (round(ln(S)·1e9), BIGINT).
    */
  def scorePositions(train: DataFrame, heldout: DataFrame): DataFrame = {
    val c1 = train.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val c2 = train.where(col("w1").isNotNull)
      .groupBy(col("w1"), col("w")).agg(count(lit(1)).as("c2"))
    val c3 = train.where(col("w2").isNotNull)
      .groupBy(col("w2"), col("w1"), col("w"))
      .agg(count(lit(1)).as("c3"))
    // ONE 1-row aggregate (not an agg-join-agg) so the broadcast build
    // side is a bounded subtree by inspection (PlanShapeSpec sweep)
    val nv = train.agg(count(lit(1)).cast("double").as("__n"),
      countDistinct(col("w")).cast("double").as("__v"))

    // Each level's PREFIX count is fused onto its n-gram table at MODEL
    // grain (r13; guide §2.4): the scoring formula only reads c2p when
    // the trigram hit (lvl=3) and c1p when the bigram hit (lvl=2), and a
    // hit IMPLIES its prefix exists in train (every trigram occurrence
    // (w2,w1,w) at position i contains the bigram occurrence (w2,w1) at
    // i−1; every bigram occurrence contains its unigram prefix) — so the
    // inner model-grain joins lose nothing and the held-out POSITION
    // STREAM crosses three n-gram joins instead of five. At corpus scale
    // (models too big to broadcast) that is two fewer stream shuffles;
    // the model-grain fuse joins shuffle only model rows.
    val c3f = c3.join(c2.select(col("w1").as("w2"), col("w").as("w1"),
      col("c2").as("c2p")), Seq("w2", "w1"))
    val c2f = c2.join(c1.select(col("w").as("w1"), col("c1").as("c1p")),
      Seq("w1"))
    val scored = heldout
      .join(c3f, Seq("w2", "w1", "w"), "left")
      .join(c2f, Seq("w1", "w"), "left")
      .join(c1, Seq("w"), "left")
      .join(broadcast(nv))

    val start = least(col("i"), lit(3))
    val lvl = when(col("i") >= 3 && col("c3").isNotNull, lit(3))
      .when(col("i") >= 2 && col("c2").isNotNull, lit(2))
      .otherwise(lit(1))
    // decimal-literal penalty factors — NOT pow(0.4, k): 0.16 is DEFINED
    // as the literal so both engines parse the identical double
    val factor = when(start - lvl === 0, lit(1.0))
      .when(start - lvl === 1, lit(0.4))
      .otherwise(lit(0.16))
    val s = when(lvl === 3,
        factor * (col("c3").cast("double") / col("c2p").cast("double")))
      .when(lvl === 2,
        factor * (col("c2").cast("double") / col("c1p").cast("double")))
      .otherwise(factor *
        ((coalesce(col("c1"), lit(0L)).cast("double") + 1.0) /
          (col("__n") + col("__v"))))
    scored.select(scored.columns.toIndexedSeq.map(col) :+ lvl.as("lvl") :+
      round(log(s) * lit(1e9)).cast("long").as("lp_nano"): _*)
  }

  /** Train on `pmod(id, 5) != 0` (80%), score the held-out 20%;
    * per-document `(idCol, n_pos, n_tri, n_bi, n_uni, lp_nano_sum)` —
    * every output column an exact BIGINT. Held-out documents with no
    * tokens keep a zero row (the left join back to the slice).
    */
  def heldoutDocScores(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val pos = positions(docs, idCol, textCol).localCheckpoint(true)
    val isHeld = pmod(col(idCol), lit(5L)) === 0
    val scored = scorePositions(pos.where(!isHeld), pos.where(isHeld))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pos"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(col("lp_nano")).as("lp_nano_sum"))
    docs.where(isHeld).select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("lp_nano_sum"), lit(0L)).as("lp_nano_sum"))
  }
}
