package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.LinearProbe

/** The trained linear probe: exact-integer GD semantics (trajectory
  * determinism, clips, floorDiv grid), the bias-only degenerate case,
  * and real separation on a planted two-vocabulary corpus.
  */
class LinearProbeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Planted corpus: `en` docs speak one vocabulary, `zh` docs a
    * disjoint one; doc_ids cover both folds for both classes.
    */
  private def planted(n: Int) = {
    val rows = (0 until n).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma alpha", "en")
      else (i.toLong, "uno dos tres uno dos", "zh")
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("trajectory is deterministic and respects the clamp/grid contract") {
    val feats = LinearProbe.featureRows(planted(40)).persist()
    val t1 = LinearProbe.train(feats)
    val t2 = LinearProbe.train(feats.repartition(7))
    feats.unpersist()
    assert(t1.length === LinearProbe.Rounds + 1)
    assert(t1.head.forall(_ == 0L))
    // partitioning-invariant: BIGINT sums + driver floorDiv updates
    assert(t1.zip(t2).forall { case (a, b) => a.sameElements(b) })
    assert(t1.flatten.forall(w =>
      w >= -LinearProbe.WMax && w <= LinearProbe.WMax))
    // training moved SOME weight off zero
    assert(t1.last.exists(_ != 0L))
  }

  test("planted two-vocabulary corpus separates perfectly on the held fold") {
    val feats = LinearProbe.featureRows(planted(60)).persist()
    val conf = LinearProbe.evalFrame(feats, LinearProbe.train(feats).last)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    feats.unpersist()
    // zero off-diagonal mass: disjoint vocabularies, LDA midpoint cut
    assert(conf.getOrElse((1L, 0L), 0L) === 0L)
    assert(conf.getOrElse((0L, 1L), 0L) === 0L)
    assert(conf((1L, 1L)) > 0L && conf((0L, 0L)) > 0L)
  }

  test("bias bucket keeps zero-token documents scored and classified") {
    val docs = Seq(
      (0L, "", "en"), (1L, "uno dos", "zh"), (2L, "alpha", "en"),
      (3L, "", "zh"), (4L, "alpha beta", "en"), (5L, "uno", "zh"),
      (6L, "alpha", "en"), (7L, "uno dos", "zh"), (8L, "alpha", "en"),
      (9L, "uno", "zh"), (10L, "alpha", "en"), (11L, "uno", "zh"))
      .toDF("doc_id", "text", "lang")
    val feats = LinearProbe.featureRows(docs).persist()
    val n = LinearProbe.evalFrame(feats, LinearProbe.train(feats).last)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    feats.unpersist()
    // every held-fold doc classified, including the empty-text ones
    assert(n === docs.where("pmod(doc_id, 5) = 0").count())
  }

  test("filterStats gate: funnel counts every doc once and agrees with evalFrame on held folds") {
    val docs = planted(60)
    val feats = LinearProbe.featureRows(docs).persist()
    val w = LinearProbe.train(feats).last
    val funnel = LinearProbe.filterStats(docs, feats, w).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val conf = LinearProbe.evalFrame(feats, w).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    feats.unpersist()
    assert(funnel.values.sum === 60L)
    // perfect separation on the planted corpus: en all kept, zh all dropped
    assert(funnel.getOrElse(("en", 0L), 0L) === 0L)
    assert(funnel.getOrElse(("zh", 1L), 0L) === 0L)
    // held-fold slice of the funnel equals the confusion's pred counts
    assert(conf((1L, 1L)) + conf.getOrElse((0L, 1L), 0L) <=
      funnel(("en", 1L)) + funnel.getOrElse(("zh", 1L), 0L))
  }

  test("floorDiv grid: engine fdiv spelling matches Math.floorDiv on negatives") {
    // the twin's (a - ((a % m + m) % m)) // m composite vs the JVM —
    // exercised where truncating division would differ (negative a)
    for (a <- Seq(-7L, -16L, -1L, 0L, 5L, 17L); m <- Seq(3L, 16L)) {
      val viaPmod = (a - (((a % m) + m) % m)) / m
      assert(viaPmod === Math.floorDiv(a, m), s"a=$a m=$m")
    }
  }

  test("scoreGate composes into curateCorpus as the pre-dedup trained gate") {
    val docs = planted(60)
    val feats = LinearProbe.featureRows(docs).persist()
    val w = LinearProbe.train(feats).last
    val gate = LinearProbe.scoreGate(feats, w)
    // planted corpus separates: the gate keeps exactly the en docs
    val gateRows = gate.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("probe_score_micro"))
      .toMap
    assert(gateRows.nonEmpty && gateRows.keySet.forall(_ % 2 == 0))
    val out = graft.llm.Curation.curateCorpus(
      docs.select($"doc_id", $"text"), "doc_id", "text",
      minQuality = 0.0, maxDupTokenRatio = 0.9, sampleFraction = 1.0,
      gate = Some(gate)).collect()
    feats.unpersist()
    // gate applies BEFORE dedup: the zh fingerprint group vanishes
    // entirely (no survivor), and the en group's min-id survives with
    // the model score carried through
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(0L))
    assert(out.head.getAs[Long]("probe_score_micro") === gateRows(0L))
  }

  test("gradient clip bounds the per-round update under adversarial scores") {
    // one gigantic doc would, unclipped, swing the gradient by
    // len*LabelScale; the residual clip caps its contribution
    val docs = (0 until 20).map { i =>
      val txt = if (i == 2) Seq.fill(500)("alpha").mkString(" ")
      else if (i % 2 == 0) "alpha beta" else "uno dos"
      (i.toLong, txt, if (i % 2 == 0) "en" else "zh")
    }.toDF("doc_id", "text", "lang")
    val feats = LinearProbe.featureRows(docs).persist()
    val traj = LinearProbe.train(feats)
    feats.unpersist()
    assert(traj.flatten.forall(w =>
      w >= -LinearProbe.WMax && w <= LinearProbe.WMax))
  }
}
