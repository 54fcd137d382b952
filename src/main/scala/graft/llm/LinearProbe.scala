package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Discriminative trained linear probe over hashing-trick features —
  * the quality-filter classifier of the GPT-3/CCNet pipelines (train a
  * cheap linear model to score documents against a target slice, keep
  * high scorers), built so the SGD-shaped objection in
  * [[NaiveBayes]]'s scaladoc ("gradient methods are sequential-by-
  * iteration and float-accumulation-ordered") is actually answered
  * rather than avoided:
  *
  *  - '''Squared loss, not logistic.''' The gradient of ½(s−y)² is
  *    (s−y)·x — pure rational arithmetic, no sigmoid/exp anywhere, so
  *    training runs entirely on an integer micro-grid (weights in
  *    1e-6 units, labels at [[LabelScale]]). A least-squares linear
  *    classifier with a calibrated threshold is the classic "linear
  *    probe"; on (near-)separable classes it classifies like the
  *    logistic fit without the transcendental.
  *  - '''Full-batch, fixed rounds.''' Each of [[Rounds]] rounds is two
  *    partitioning-invariant BIGINT aggregates (per-doc scores, then
  *    per-bucket gradient sums); the weight update itself runs on the
  *    driver over the collected 65-row gradient (the bounded
  *    model-grain collect of the kMeans-centroid pattern) with
  *    `Math.floorDiv` — every intermediate is an exact integer, so the
  *    trajectory is bit-reproducible on any cluster layout and the
  *    DuckDB twin replays it round for round.
  *  - '''Per-example gradient clipping''' bounds the BIGINT sums: a
  *    clipped residual |r̂| ≤ [[RClamp]] caps the gradient at
  *    RClamp · Σ|x| ≤ 2e6 · total_train_tokens — safe to ~4.6e12
  *    training tokens (int64 headroom); past that, shard the gradient
  *    sum or lower RClamp (documented bound, asserted in the spec).
  *
  * Features are [[FeatureHash.hashedFeatures]]'s signed hashed unigram
  * buckets (dims = [[Dims]]) plus an always-on bias bucket [[Dims]],
  * so zero-token documents still score. The shipped task is
  * English-vs-rest over `documents.lang`. (On the synthetic test
  * corpus all langs share one vocabulary, so the shipped confusion is
  * near-chance by construction — the spec proves separation on a
  * planted two-vocabulary corpus; on a real corpus the lang signal is
  * lexical.) Split: `pmod(doc_id, 5) = 0` held out (the repo's
  * standing split discipline); the decision threshold is calibrated on
  * TRAIN scores as the floor-midpoint of the two class means (the
  * LDA-style cut — integer floorDiv on both engines).
  *
  * Scale shape: featurization is one explode + one (doc, bucket)
  * aggregate; each round touches only the persisted (doc, bucket)
  * feature frame, repartitioned by doc_id so the per-doc score
  * aggregate and the residual join reuse one exchange; the only
  * shuffle that varies per round is the 65-key gradient aggregate.
  * Nothing data-grain is collected or broadcast — the driver sees 65
  * gradient rows per round and two 1-row calibration aggregates.
  *
  * Reference anchor: the reference pipeline has no trained models
  * (its classifier-shaped gates are rule predicates — the validity
  * filters of `dags/pdq_etl_dag.py` / `spark_jobs/transform_*.py`);
  * this family is extension scope alongside [[NaiveBayes]]/[[Dsir]].
  */
object LinearProbe {

  /** Hashed feature buckets (bias lives at index [[Dims]]). */
  val Dims = 64

  /** Fixed full-batch GD rounds — part of the model contract. */
  val Rounds = 12

  /** Inverse learning rate: Δw = floorDiv(g, LrInv · nTrain). */
  val LrInv = 16L

  /** Weight clamp (micro units) — projected GD keeps |w| ≤ 4.0. */
  val WMax = 4000000L

  /** Per-example residual clip (micro units): |ŝ−y| capped at 2.0. */
  val RClamp = 2000000L

  /** Label grid: y ∈ {0, LabelScale} micro. */
  val LabelScale = 1000000L

  /** Positive-class predicate on `documents` (English vs rest). */
  val PosLang = "en"

  /** (doc_id, y, bucket, value): signed hashed counts + the bias row,
    * labels attached, repartitioned by doc_id so the per-round score
    * window needs no further exchange.
    */
  def featureRows(docs: DataFrame): DataFrame = {
    val lab = docs.select(col("doc_id"),
      when(col("lang") === PosLang, lit(1L)).otherwise(lit(0L)).as("y"),
      pmod(col("doc_id"), lit(5L)).as("fold"))
    val fh = FeatureHash.hashedFeatures(docs, "doc_id", "text", Dims)
    val bias = docs.select(col("doc_id"),
      lit(Dims.toLong).as("bucket"), lit(1L).as("value"))
    fh.unionByName(bias).join(lab, Seq("doc_id"))
      .repartition(col("doc_id"))
  }

  /** One exact-integer training run: returns the weight trajectory
    * `w(0) .. w(Rounds)` as arrays indexed by bucket. `feats` must be
    * [[featureRows]] output (persist it — every round scans it).
    */
  def train(feats: DataFrame): Seq[Array[Long]] = {
    val train = feats.filter(col("fold") =!= 0L)
    val nTrain = train.select(countDistinct(col("doc_id"))).head().getLong(0)
    require(nTrain > 0, "empty train split")
    val step = LrInv * nTrain
    val trajectory = Vector.newBuilder[Array[Long]]
    var w = Array.fill(Dims + 1)(0L)
    trajectory += w.clone()
    (1 to Rounds).foreach { _ =>
      // r12: the 65 weights ride as an ARRAY LITERAL (bounded by the
      // Dims contract, not the data) instead of a broadcast-joined
      // 65-row frame, and the per-doc score is a window over the
      // doc_id-partitioned feature frame instead of a groupBy followed
      // by a residual⋈feature self-join — one feats scan per round
      // instead of two, no per-round broadcast build, same integers.
      val wLit = typedlit(w.toSeq)
      val wd = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
      val scored = train
        .withColumn("__s", sum(col("value") *
          element_at(wLit, col("bucket").cast("int") + 1)).over(wd))
        .withColumn("__r", greatest(lit(-RClamp), least(lit(RClamp),
          col("__s") - col("y") * lit(LabelScale))))
      // bucket-grain gradient — the only per-round collect (≤ 65 rows)
      val g = scored.groupBy(col("bucket"))
        .agg(sum(col("__r") * col("value")).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      w = w.zipWithIndex.map { case (wt, b) =>
        val upd = wt - Math.floorDiv(g.getOrElse(b, 0L), step)
        math.max(-WMax, math.min(WMax, upd))
      }
      trajectory += w.clone()
    }
    trajectory.result()
  }

  /** The weight trajectory as a frame: (step, bucket, w_micro) —
    * (Rounds+1) · (Dims+1) rows, the full training run certifiable
    * bit-for-bit.
    */
  def traceFrame(spark: SparkSession, traj: Seq[Array[Long]]): DataFrame = {
    import spark.implicits._
    traj.zipWithIndex.flatMap { case (w, k) =>
      w.zipWithIndex.map { case (wt, b) => (k.toLong, b.toLong, wt) }
    }.toDF("step", "bucket", "w_micro")
  }

  /** Per-document scores under a fixed weight vector:
    * (doc_id, s, y, fold).
    */
  private def perDocScores(feats: DataFrame,
                           w: Array[Long]): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val wDf = broadcast(
      w.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }
        .toSeq.toDF("bucket", "w"))
    feats.join(wDf, Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("value") * col("w")).as("s"),
        max(col("y")).as("y"), max(col("fold")).as("fold"))
  }

  /** LDA-style cut calibrated on TRAIN folds only:
    * floorDiv(mu0 + mu1, 2) over the integer class mean scores.
    */
  private def calibratedThreshold(perDoc: DataFrame): Long = {
    val cal = perDoc.filter(col("fold") =!= 0L).agg(
      sum(when(col("y") === 1L, col("s"))).as("s1"),
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("y") === 0L, col("s"))).as("s0"),
      sum(when(col("y") === 0L, 1L).otherwise(0L)).as("n0")).head()
    require(cal.getLong(1) > 0 && cal.getLong(3) > 0,
      "threshold calibration needs both classes in the train split")
    val mu1 = Math.floorDiv(cal.getLong(0), cal.getLong(1))
    val mu0 = Math.floorDiv(cal.getLong(2), cal.getLong(3))
    Math.floorDiv(mu0 + mu1, 2L)
  }

  /** Held-fold confusion at (label, pred) grain with exact score sums,
    * under the [[calibratedThreshold]] of the FINAL weights.
    */
  def evalFrame(feats: DataFrame, wFinal: Array[Long]): DataFrame = {
    val perDoc = perDocScores(feats, wFinal)
    val thresh = calibratedThreshold(perDoc)
    perDoc.filter(col("fold") === 0L)
      .select(col("y").as("label"),
        when(col("s") >= thresh, lit(1L)).otherwise(lit(0L)).as("pred"),
        col("s"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n_docs"), sum(col("s")).as("sum_score_micro"))
  }

  /** The gate as a composable doc-grain frame: every document whose
    * integer score under the FINAL weights clears the calibrated
    * threshold, with the score carried as `probe_score_micro`. This is
    * the form a pipeline composes (inner-join on the id applies the
    * gate); [[filterStats]] is its auditable (lang, kept) summary. The
    * frame derives from `feats`, which [[featureRows]] repartitioned by
    * doc_id — so the downstream id-equi-join is co-partitioned with
    * everything else keyed on the document id, no extra exchange.
    */
  def scoreGate(feats: DataFrame, wFinal: Array[Long]): DataFrame = {
    val perDoc = perDocScores(feats, wFinal)
    val thresh = calibratedThreshold(perDoc)
    perDoc.where(col("s") >= thresh)
      .select(col("doc_id"), col("s").as("probe_score_micro"))
  }

  /** The quality-GATE product: score EVERY document under the final
    * weights and report the keep/drop funnel at (lang, kept) grain —
    * what a 100 TB curation run would actually materialize (the
    * doc-grain filter is the same `s >= thresh` predicate; this
    * aggregate is its auditable summary). Calibration never peeks at
    * held data; the gate itself applies to all folds.
    */
  def filterStats(docs: DataFrame, feats: DataFrame,
                  wFinal: Array[Long]): DataFrame = {
    val perDoc = perDocScores(feats, wFinal)
    val thresh = calibratedThreshold(perDoc)
    docs.select(col("doc_id"), col("lang"))
      .join(perDoc.select(col("doc_id"), col("s")), Seq("doc_id"))
      .groupBy(col("lang"),
        when(col("s") >= thresh, lit(1L)).otherwise(lit(0L)).as("kept"))
      .agg(count(lit(1)).as("n_docs"), sum(col("s")).as("sum_score_micro"))
  }
}
