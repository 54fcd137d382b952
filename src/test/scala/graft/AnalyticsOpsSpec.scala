package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Anomaly, Intervals, Sampling, SnapshotDiff, Triangles}

/** Round-6 analytic operators: CDC snapshot diff, interval sweep-line /
  * gaps-and-islands, degree-oriented triangle counting, median/MAD
  * outliers, and systematic PPS sampling — all against hand-computed
  * fixtures.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ------------------------------------------------------------ diff

  test("snapshot diff classifies insert/delete/update and drops unchanged") {
    val old = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"),
      (4L, 40L, null.asInstanceOf[String])).toDF("k", "n", "s")
    val neu = Seq((2L, 20L, "b"), (3L, 31L, "c"), (4L, 40L, "now"),
      (5L, 50L, "e")).toDF("k", "n", "s")
    val d = SnapshotDiff.diff(old, neu, Seq("k"), Seq("n", "s"))
      .select("k", "change_type").as[(Long, String)].collect().toMap
    assert(d === Map(1L -> "delete", 3L -> "update", 4L -> "update",
      5L -> "insert")) // 2 unchanged → absent
  }

  test("snapshot diff carries old/new values with nulls on the absent side") {
    val old = Seq((1L, 10L)).toDF("k", "n")
    val neu = Seq((2L, 20L)).toDF("k", "n")
    val rows = SnapshotDiff.diff(old, neu, Seq("k"), Seq("n"))
      .orderBy("k")
      .select("k", "old_n", "new_n", "change_type")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2), r.getString(3)))
    assert(rows.toSeq === Seq((1L, 10L, null, "delete"),
      (2L, null, 20L, "insert")))
  }

  // ------------------------------------------------------- intervals

  private def iv(rows: (String, Long, Long)*) =
    rows.toDF("g", "s", "e")

  test("peak concurrency: touching spans don't overlap (end-exclusive)") {
    val peak = Intervals.peakConcurrency(
        iv(("a", 1, 3), ("a", 3, 5), ("a", 5, 7)), Seq("g"), col("s"), col("e"))
      .as[(String, Long)].collect().toMap
    assert(peak === Map("a" -> 1L))
  }

  test("peak concurrency: nesting and ties, per group") {
    val df = iv(
      ("a", 1, 10), ("a", 2, 4), ("a", 3, 4), ("a", 4, 6), // depth 3 at t=3
      ("b", 1, 2), ("b", 5, 6))
    val peak = Intervals.peakConcurrency(df, Seq("g"), col("s"), col("e"))
      .as[(String, Long)].collect().toMap
    assert(peak === Map("a" -> 3L, "b" -> 1L))
  }

  test("union length merges overlaps and keeps gaps") {
    // [1,5)∪[3,7) = 6, gap, [10,11) = 1 → 7; b: duplicates count once
    val df = iv(("a", 1, 5), ("a", 3, 7), ("a", 10, 11),
      ("b", 2, 4), ("b", 2, 4))
    val u = Intervals.unionLength(df, Seq("g"), col("s"), col("e"))
      .as[(String, Long)].collect().toMap
    assert(u === Map("a" -> 7L, "b" -> 2L))
  }

  test("inverted or empty spans are rejected") {
    val e = intercept[Exception] {
      Intervals.peakConcurrency(iv(("a", 5, 5)), Seq("g"), col("s"), col("e"))
        .collect()
    }
    assert(e.getMessage.contains("end must be strictly after start"))
  }

  // ------------------------------------------------------- triangles

  test("triangle counts on K4: every node sits in C(3,2)=3 triangles") {
    val k4 = for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)
    val counts = Triangles.triangleCounts(k4.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts ignore direction, duplicates, self-loops; " +
    "non-triangle nodes omitted") {
    // triangle 1-2-3 (edges given in mixed directions, one duplicated,
    // plus a self-loop and a pendant node 4)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L), (1L, 3L), (3L, 3L),
      (3L, 4L)).toDF("x", "y")
    val counts = Triangles.triangleCounts(edges, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // 4 absent
  }

  test("triangle counts reject node ids outside the packable window") {
    val e = intercept[Exception] {
      Triangles.triangleCounts(
        Seq((-1L, 2L), (2L, 3L), (-1L, 3L)).toDF("x", "y"), "x", "y").collect()
    }
    assert(e.getMessage.contains("outside [0, 2^40)"))
  }

  test("two triangles sharing an edge count both endpoints twice") {
    val bowtieish = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L))
      .toDF("x", "y")
    val counts = Triangles.triangleCounts(bowtieish, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  // ----------------------------------------------------------- k-core

  test("k-core peels tails and keeps the dense kernel") {
    import graft.ops.KCore
    // K4 on 1..4, a tail 4-5-6, and a separate triangle 7-8-9
    val edges = (for (u <- 1L to 4L; v <- (u + 1) to 4L) yield (u, v)) ++
      Seq((4L, 5L), (5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
    val df = edges.toDF("x", "y")
    val core3 = KCore.kCoreNodes(df, "x", "y", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(core3 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)) // K4 only
    val core2 = KCore.kCoreNodes(df, "x", "y", k = 2)
      .select("node").as[Long].collect().toSet
    assert(core2 === Set(1L, 2L, 3L, 4L, 7L, 8L, 9L)) // tail peeled
  }

  test("k-core matches a brute-force peel on a hashed graph") {
    import graft.ops.KCore
    val edges = (0L until 60L).map(i => (i % 30L, (i * 7 + 3) % 30L))
      .filter { case (a, b) => a != b }
    // brute-force reference peel on the canonical edge set
    var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toSet
    var changed = true
    while (changed) {
      val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val low = deg.filter(_._2 < 3).keySet
      val next = es.filter { case (a, b) => !low(a) && !low(b) }
      changed = next != es
      es = next
    }
    val got = KCore.kCoreEdges(edges.toDF("x", "y"), "x", "y", k = 3)
      .as[(Long, Long)].collect().map { case (u, v) => (u, v) }.toSet
    assert(got === es)
  }

  test("k-core throws rather than returning an unconverged peel") {
    import graft.ops.KCore
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("x", "y")
    val e = intercept[IllegalStateException] {
      KCore.kCoreEdges(chain, "x", "y", k = 2, maxIter = 1)
    }
    assert(e.getMessage.contains("no convergence"))
  }

  test("k-core converging on exactly the last allowed round returns, not throws") {
    import graft.ops.KCore
    // triangle + one pendant: a single peel round settles it
    val df = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("x", "y")
    val nodes = KCore.kCoreNodes(df, "x", "y", k = 2, maxIter = 1)
      .select("node").as[Long].collect().toSet
    assert(nodes === Set(1L, 2L, 3L))
  }

  // --------------------------------------------------------- anomaly

  test("MAD outliers: a wild value flags without dragging the median") {
    val df = Seq(("g", 10L), ("g", 10L), ("g", 12L), ("g", 14L),
      ("g", 1000L)).toDF("grp", "v")
    val flagged = Anomaly.flagOutliers(df, Seq("grp"), col("v"), 3.0)
    val out = flagged.where(col("is_outlier")).select("v")
      .as[Long].collect().toSeq
    assert(out === Seq(1000L))
    val stats = Anomaly.madStats(df, Seq("grp"), col("v"))
      .select("n", "med", "mad").as[(Long, Double, Double)].head()
    assert(stats === ((5L, 12.0, 2.0))) // med 12; |dev| = 2,2,0,2,988 → mad 2
  }

  test("MAD outliers: even-count groups interpolate; all-equal flags none") {
    val df = Seq(("e", 1L), ("e", 2L), ("e", 3L), ("e", 4L),
      ("c", 7L), ("c", 7L), ("c", 7L)).toDF("grp", "v")
    val stats = Anomaly.madStats(df, Seq("grp"), col("v"))
      .select("grp", "med", "mad").as[(String, Double, Double)]
      .collect().map { case (g, m, d) => g -> ((m, d)) }.toMap
    assert(stats("e") === ((2.5, 1.0))) // devs 1.5,0.5,0.5,1.5 → mad 1.0
    assert(stats("c") === ((7.0, 0.0)))
    val n = Anomaly.flagOutliers(df.where(col("grp") === "c"), Seq("grp"),
      col("v"), 3.0).where(col("is_outlier")).count()
    assert(n === 0L)
  }

  test("winsorize clips into the exact interpolated percentile band") {
    val df = (1L to 10L).map(("g", _)).toDF("grp", "v")
    val w = Anomaly.winsorize(df, Seq("grp"), col("v"), 0.1, 0.9)
    val band = w.select("p_lo", "p_hi").as[(Double, Double)].head()
    assert(band === ((1.9, 9.1))) // h = 0.9 and 8.1 over sorted 1..10
    val clipped = w.agg(sum(col("winsorized"))).as[Double].head()
    assert(clipped === (2L to 9L).sum + 1.9 + 9.1) // only the tails move
  }

  // ----------------------------------------------------------- trend

  test("linear trend from integer moments: slope, intercept, degenerate groups") {
    import graft.ops.Trend
    val df = Seq(
      ("up", 0L, 10L), ("up", 1L, 12L), ("up", 2L, 14L), // slope 2, icpt 10
      ("flat", 5L, 7L), ("flat", 6L, 7L),                // slope 0, icpt 7
      ("one", 3L, 9L))                                   // single x → nulls
      .toDF("g", "x", "y")
    val r = Trend.linearTrend(df, Seq("g"), col("x"), col("y"))
      .collect().map(row => row.getString(0) ->
        ((row.getLong(1), Option(row.get(2)), Option(row.get(3))))).toMap
    assert(r("up") === ((3L, Some(2.0), Some(10.0))))
    assert(r("flat") === ((2L, Some(0.0), Some(7.0))))
    assert(r("one") === ((1L, None, None)))
  }

  // ------------------------------------------------------ statistics

  test("pearson: perfect, zero, and undefined correlations from integer moments") {
    import graft.ops.Stats
    val df = Seq(
      ("pos", 0L, 0L), ("pos", 1L, 2L), ("pos", 2L, 4L),
      ("neg", 0L, 4L), ("neg", 1L, 2L), ("neg", 2L, 0L),
      ("zero", 0L, 0L), ("zero", 1L, 1L), ("zero", 2L, 0L),
      ("flat", 1L, 7L), ("flat", 2L, 7L)) // zero y-variance → null
      .toDF("g", "x", "y")
    val r = Stats.pearson(df, Seq("g"), col("x"), col("y"))
      .collect().map(row => row.getString(0) ->
        (if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toMap
    assert(r("pos") === Some(1.0) && r("neg") === Some(-1.0))
    assert(r("zero") === Some(0.0) && r("flat") === None)
  }

  test("spearman: monotone nonlinearity is 1, ties average, constant is null") {
    import graft.ops.Stats
    // perfectly monotone but NONLINEAR (Pearson < 1 here; Spearman = 1)
    val mono = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 1000L)).toDF("x", "y")
    assert(Stats.spearman(mono, col("x"), col("y")).head().getDouble(1) === 1.0)
    // matching ties on both sides keep perfect rank agreement
    val tied = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    assert(Stats.spearman(tied, col("x"), col("y")).head().getDouble(1) === 1.0)
    // hand case: ranks (1,2,3) vs (3,1,2) → ρ = −0.5
    val hand = Seq((1L, 9L), (2L, 1L), (3L, 5L)).toDF("x", "y")
    assert(Stats.spearman(hand, col("x"), col("y")).head().getDouble(1) === -0.5)
    // constant side → undefined
    val const = Seq((1L, 7L), (2L, 7L)).toDF("x", "y")
    assert(Stats.spearman(const, col("x"), col("y")).head().isNullAt(1))
  }

  test("pearson and chi-square drop incomplete rows instead of corrupting stats") {
    import graft.ops.Stats
    // a null y must not count into n while missing from the sums
    val df = Seq(("g", Some(1L), Some(1L)), ("g", Some(2L), Some(2L)),
      ("g", Some(3L), None: Option[Long])).toDF("g", "x", "y")
    val r = Stats.pearson(df, Seq("g"), col("x"), col("y"))
      .select("n", "corr").as[(Long, Double)].head()
    assert(r === ((2L, 1.0))) // the two complete pairs correlate perfectly
    // a null category must not inflate n while vanishing from the cells
    val cat = Seq(("a1", Some("b1")), ("a1", Some("b2")),
      ("a2", Some("b1")), ("a2", Some("b2")),
      ("a1", None: Option[String])).toDF("a", "b")
    val c = Stats.chiSquare(cat, col("a"), col("b"))
      .select("n", "chi2").as[(Long, Double)].head()
    assert(c === ((4L, 0.0))) // 4 complete rows, uniform → independent
  }

  test("chi-square: independence gives 0; the textbook 2x2 gives 20") {
    import graft.ops.Stats
    val indep = (for (a <- Seq("a1", "a2"); b <- Seq("b1", "b2");
                      _ <- 1 to 25) yield (a, b)).toDF("a", "b")
    val r0 = Stats.chiSquare(indep, col("a"), col("b"))
      .select("n", "dof", "chi2").as[(Long, Long, Double)].head()
    assert(r0 === ((100L, 1L, 0.0)))
    val dep = (Seq.fill(30)(("a1", "b1")) ++ Seq.fill(10)(("a1", "b2")) ++
      Seq.fill(10)(("a2", "b1")) ++ Seq.fill(30)(("a2", "b2"))).toDF("a", "b")
    val r1 = Stats.chiSquare(dep, col("a"), col("b"))
      .select("n", "dof", "chi2").as[(Long, Long, Double)].head()
    assert(r1 === ((80L, 1L, 20.0))) // every cell deviates 10 from exp 20
  }

  // -------------------------------------------------------- sampling

  test("systematic PPS selects the stride-boundary owners in key order") {
    val df = Seq(("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 4L),
      ("g", 4L, 4L), ("g", 5L, 4L)).toDF("grp", "k", "w")
    // cum 4,8,12,16,20 with stride 10 → rows owning 10 and 20: k=3, k=5
    val sel = Sampling.ppsSystematic(df, Seq("grp"), col("k"), col("w"), 10L)
      .where(col("selected")).select("k").as[Long].collect().toSeq.sorted
    assert(sel === Seq(3L, 5L))
  }

  test("systematic PPS: heavy rows always selected, zero-weight never") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, 25L), ("g", 3L, 0L), ("g", 4L, 3L))
      .toDF("grp", "k", "w")
    // cum 0,25,25,28; stride 10 → k=2 spans (0,25] covering 10 and 20
    val sel = Sampling.ppsSystematic(df, Seq("grp"), col("k"), col("w"), 10L)
      .where(col("selected")).select("k").as[Long].collect().toSeq
    assert(sel === Seq(2L))
  }

  test("systematic PPS rejects negative weights") {
    val df = Seq(("g", 1L, -1L)).toDF("grp", "k", "w")
    val e = intercept[Exception] {
      Sampling.ppsSystematic(df, Seq("grp"), col("k"), col("w"), 10L).collect()
    }
    assert(e.getMessage.contains("negative weight"))
  }

  test("weighted reservoir: k per group, deterministic, zero-weight excluded") {
    val df = (1L to 50L).map(i => ("g" + (i % 2), i, if (i == 7) 0L else i))
      .toDF("grp", "id", "w")
    val s1 = Sampling.weightedReservoir(df, Seq("grp"), "id", col("w"), 5, 42L)
      .select("grp", "id", "sample_rank").collect().toSeq.sortBy(_.toString)
    val s2 = Sampling.weightedReservoir(df.repartition(8), Seq("grp"), "id",
        col("w"), 5, 42L)
      .select("grp", "id", "sample_rank").collect().toSeq.sortBy(_.toString)
    assert(s1 === s2)
    assert(s1.groupBy(_.getString(0)).forall(_._2.length === 5))
    assert(!s1.exists(_.getLong(1) === 7L)) // zero weight never sampled
  }

  test("weighted reservoir: inclusion frequency tracks weight across seeds") {
    // two items, weights 9:1 — item 1 should win ~90% of seeds
    val df = Seq(("g", 1L, 9L), ("g", 2L, 1L)).toDF("grp", "id", "w")
    val wins = (0L until 100L).count { seed =>
      Sampling.weightedReservoir(df, Seq("grp"), "id", col("w"), 1, seed)
        .select("id").as[Long].head() === 1L
    }
    assert(wins >= 75 && wins <= 99, s"heavy item won $wins/100")
  }

  test("HLL pairwise overlap: inclusion-exclusion near-exact on sparse sets, clamped when disjoint") {
    import graft.ops.Reagg
    val vals = ((1 to 100).map(("A", _)) ++ (51 to 150).map(("B", _)) ++
      (200 to 250).map(("C", _))).toDF("k", "v")
    val sk = vals.groupBy(col("k")).agg(Reagg.distinctSketch(col("v"), 14)
      .as("sk"))
    val est = Reagg.pairwiseOverlap(sk, "k", "sk")
      .select("key_a", "key_b", "est_inter").as[(String, String, Long)]
      .collect().map { case (a, b, i) => (a, b) -> i }.toMap
    assert(math.abs(est(("A", "B")) - 50L) <= 2L) // sparse mode ≈ exact
    assert(est(("A", "C")) >= 0L && est(("A", "C")) <= 2L)
    assert(est(("B", "C")) >= 0L && est(("B", "C")) <= 2L)
  }
}
