package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Eval

/** Classifier-eval aggregates: hand-checked confusion stats, κ against
  * its definition, and Mann-Whitney AUC incl. tie handling.
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("classStats: per-class P/R/F1, one-sided classes kept") {
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
      ("c", "c"), ("a", "d"), ("e", "f"), ("f", "e")).toDF("y", "p")
    val rows = Eval.classStats(df, col("y"), col("p")).orderBy("clazz")
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b", "c", "d", "e", "f"))
    val a = rows(0)
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((4L, 2L, 2L)))
    assert(a.getDouble(4) === 1.0)          // precision 2/2
    assert(a.getDouble(5) === 0.5)          // recall 2/4
    assert(a.getDouble(6) === 0.666667)     // f1 = 2*2/(2+4)
    val d = rows(3)
    assert((d.getLong(1), d.getLong(2), d.getLong(3)) === ((0L, 1L, 0L)))
    assert(d.getDouble(4) === 0.0)          // precision 0/1
    assert(d.isNullAt(5) && d.isNullAt(6))  // no actuals → recall undefined
    // tp=0 with BOTH sides populated: F1 is a defined 0.0, not null —
    // macro-F1 averages must include the always-confused classes
    val e = rows(4)
    assert((e.getLong(1), e.getLong(2), e.getLong(3)) === ((1L, 1L, 0L)))
    assert(e.getDouble(4) === 0.0 && e.getDouble(5) === 0.0 &&
      e.getDouble(6) === 0.0)
  }

  test("cohenKappa: chance-level is 0, perfect is 1, constant-equal is null") {
    val chance = Seq(("y", "y"), ("y", "n"), ("n", "y"), ("n", "n"))
      .toDF("a", "b")
    val r = Eval.cohenKappa(chance, col("a"), col("b")).head()
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2)) === ((4L, 0.5, 0.5)))
    assert(r.getDouble(3) === 0.0)
    val perfect = Seq(("y", "y"), ("n", "n"), ("m", "m")).toDF("a", "b")
    assert(Eval.cohenKappa(perfect, col("a"), col("b")).head().getDouble(3)
      === 1.0)
    val const = Seq(("y", "y"), ("y", "y")).toDF("a", "b")
    assert(Eval.cohenKappa(const, col("a"), col("b")).head().isNullAt(3))
  }

  test("mutualInformation: independence is 0, identity is H, constant is null") {
    // perfectly independent 2×2 (equal cell counts)
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val ri = Eval.mutualInformation(indep, col("a"), col("b")).head()
    assert(ri.getLong(0) === 4L && ri.getDouble(1) === 0.0 &&
      ri.getDouble(2) === 0.0)
    // identity: MI = H(A) = ln 2, NMI = 1
    val ident = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y"))
      .toDF("a", "b")
    val rd = Eval.mutualInformation(ident, col("a"), col("b")).head()
    assert(math.abs(rd.getDouble(1) - 0.693147) < 1e-9)
    assert(rd.getDouble(2) === 1.0)
    // constant side: zero entropy → NMI undefined, MI 0
    val const = Seq(("x", "p"), ("y", "p")).toDF("a", "b")
    val rc = Eval.mutualInformation(const, col("a"), col("b")).head()
    assert(rc.getDouble(1) === 0.0 && rc.isNullAt(2))
  }

  test("quantileRank: mid-rank percentiles within each group, ties share") {
    val df = Seq(("s1", 10L), ("s1", 20L), ("s1", 20L), ("s1", 30L),
      ("s2", 5L)).toDF("src", "v")
    val got = graft.ops.Normalize.quantileRank(df, "src", "v")
      .orderBy("src", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // s1: 10 → (0·2+1+1)/8 = 0.25; 20,20 → (2+2+1)/8 = 0.625 both;
    // 30 → (6+1+1)/8 = 1.0; s2 single → (0+1+1)/2 = 1.0
    assert(got.toSeq === Seq(("s1", 10L, 0.25), ("s1", 20L, 0.625),
      ("s1", 20L, 0.625), ("s1", 30L, 1.0), ("s2", 5L, 1.0)))
  }

  test("aucMannWhitney: separation, reversal, ties, the half-tie credit") {
    def auc(rows: Seq[(Long, Boolean)]): java.lang.Double = {
      val r = Eval.aucMannWhitney(rows.toDF("s", "y"), col("s"), col("y"))
        .head()
      if (r.isNullAt(2)) null else r.getDouble(2)
    }
    assert(auc(Seq((10L, true), (20L, true), (1L, false), (2L, false))) === 1.0)
    assert(auc(Seq((1L, true), (2L, true), (10L, false), (20L, false))) === 0.0)
    assert(auc(Seq((5L, true), (5L, false), (5L, true), (5L, false))) === 0.5)
    // pos at 5 ties one neg (half credit) and beats the neg at 1
    assert(auc(Seq((5L, true), (1L, false), (5L, false))) === 0.75)
    // degenerate: single-class input → null
    assert(auc(Seq((5L, true), (6L, true))) === null)
  }

  test("gini: uniform is 0, concentrated approaches 1, tie-order invariant") {
    import graft.ops.Stats
    val df = Seq(
      ("even", 10L), ("even", 10L), ("even", 10L), ("even", 10L),
      ("conc", 0L), ("conc", 0L), ("conc", 0L), ("conc", 100L),
      ("zero", 0L), ("zero", 0L))
      .toDF("g", "cents")
    val got = Stats.gini(df, "g", "cents")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3).asInstanceOf[AnyRef]))
      .toMap
    assert(got("even") === 0.0)
    // one of four holds all: G = 2·(4·100)/(4·100) − 5/4 = 0.75
    assert(got("conc") === 0.75)
    assert(got("zero") === null)
    // ties: any rank order of equal values gives the same Σi·x
    val shuffled = Stats.gini(df.orderBy(rand(7)), "g", "cents")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) null else r.getDouble(3).asInstanceOf[AnyRef]))
      .toMap
    assert(shuffled === got)
  }

  test("calibrationCurve: width bins, clamps, exact counts, both rates") {
    val rows = Seq(
      (50000L, false), (150000L, false), (150000L, true),
      (999998L, true), (1000000L, true), // top edge clamps into bin 9
      (-6L, false)) // negative clamps into bin 0
    val got = Eval.calibrationCurve(rows.toDF("s", "y"),
        col("s"), col("y"), nBins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set(0L, 1L, 9L))
    assert(got(0L) === ((2L, 0L, 0.0, 0.024997)))  // (50000 + (-6))/2/1e6
    assert(got(1L) === ((2L, 1L, 0.5, 0.15)))
    assert(got(9L) === ((2L, 2L, 1.0, 0.999999)))  // (999998+1000000)/2/1e6
  }
}
