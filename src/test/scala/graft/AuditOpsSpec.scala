package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistical/structural DQ audits added in round 7: Benford first-digit
  * screen, functional-dependency violations, seasonal indices, the
  * temperature mixture allocation, and Flesch moments.
  */
class AuditOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("benfordFirstDigit: counts per digit, shares, Benford expectation") {
    // 30 values: first digits 1×15, 2×9, 9×6; zeros/negatives/nulls excluded
    val vals = Seq.fill(15)(123L) ++ Seq.fill(9)(29L) ++ Seq.fill(6)(9000L) ++
      Seq(0L, -5L)
    val df = (vals.map(Option(_)) :+ (None: Option[Long])).toDF("v")
    val rows = graft.ops.Stats.benfordFirstDigit(df, col("v")).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 9))
    assert(rows.map(_.getLong(1)).toSeq === Seq(15L, 9L, 6L))
    assert(rows(0).getDouble(2) === 0.5)
    // benford share of digit 1 = log10(2) ≈ 0.30103
    assert(rows(0).getDouble(3) === 0.30103)
    assert(math.abs(rows(0).getDouble(4) - 0.19897) < 1e-9)
    // mad_term = |gap|/9
    assert(math.abs(rows(0).getDouble(5) - 0.19897 / 9.0) < 1e-6)
  }

  test("fdViolations: holds-FD reports zero, broken FD quantifies blast radius") {
    val df = Seq(
      (1L, "a", "X"), (1L, "a", "X"),       // k=1 consistent
      (2L, "b", "X"), (2L, "c", "X"),       // k=2 violates k->v (b,c)
      (3L, null.asInstanceOf[String], "Y"), // k=3: null + 'd' = 2 values
      (3L, "d", "Y")
    ).toDF("k", "v", "w")
    val rows = graft.ops.Profile.fdViolations(df,
      Seq((Seq("k"), "v"), (Seq("k"), "w"))).orderBy("fd").collect()
    val kv = rows(0)
    assert(kv.getString(0) === "k -> v")
    assert((kv.getLong(1), kv.getLong(2), kv.getLong(3), kv.getLong(4)) ===
      ((3L, 2L, 4L, 2L)))
    val kw = rows(1)
    assert(kw.getString(0) === "k -> w")
    assert((kw.getLong(2), kw.getLong(3)) === ((0L, 0L)))
    intercept[IllegalArgumentException] {
      graft.ops.Profile.fdViolations(df, Seq((Seq("k"), "k")))
    }
  }

  test("seasonalIndices: flat series gives index 1; spike slot rises above it") {
    // 4 periods of a period-4 series, flat at 100 except slot 2 at 200
    val df = (0 until 16).map { t =>
      (t.toLong, if (t % 4 == 2) 200L else 100L)
    }.toDF("tick", "v")
    val rows = graft.ops.Trend.seasonalIndices(df, "tick", "v", period = 4)
      .collect()
    val bySlot = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // trend is constant 125; flat slots → 100/125 = 0.8, spike → 200/125 = 1.6
    assert(bySlot(0L) === 0.8 && bySlot(1L) === 0.8 && bySlot(3L) === 0.8)
    assert(bySlot(2L) === 1.6)
    // edges drop: interior ticks only
    assert(rows.map(_.getLong(1)).sum < 16)
  }

  test("seasonalIndices rejects odd periods") {
    val df = Seq((0L, 1L)).toDF("tick", "v")
    intercept[IllegalArgumentException] {
      graft.ops.Trend.seasonalIndices(df, "tick", "v", period = 5)
    }
  }

  test("temperatureAllocation: alpha=1 is proportional, alpha=0 is uniform") {
    val df = Seq.fill(90)(("big", 10L)) ++ Seq.fill(10)(("small", 10L))
    val d = df.toDF("src", "n")
    val p1 = graft.llm.Curation.temperatureAllocation(d, "src", "n",
        alpha = 1.0, budgetTokens = 1000L)
      .orderBy("source").collect()
    assert(p1.map(_.getDouble(4)).toSeq === Seq(0.9, 0.1)) // p_alpha ∝ n
    val p0 = graft.llm.Curation.temperatureAllocation(d, "src", "n",
        alpha = 0.0, budgetTokens = 1000L)
      .orderBy("source").collect()
    assert(p0.map(_.getDouble(4)).toSeq === Seq(0.5, 0.5)) // uniform
    // epochs = alloc / corpus: uniform budget over-cycles the small source
    assert(p0(1).getDouble(6) > p0(0).getDouble(6))
  }

  test("meanShiftScan finds the planted level shift with the right score") {
    // 10 ticks at 100, then 10 at 200 → split after tick 9 (0-based),
    // score = 100 * sqrt(10*10/20) = 223.606798
    val df = (0 until 20).map(t => (t.toLong, if (t < 10) 100L else 200L))
      .toDF("tick", "v")
    val r = graft.ops.ChangePoint.meanShiftScan(df, "tick", "v").head()
    assert(r.getLong(0) === 9L)
    assert((r.getLong(1), r.getLong(2)) === ((10L, 10L)))
    assert((r.getDouble(3), r.getDouble(4)) === ((100.0, 200.0)))
    assert(r.getDouble(5) === 223.606798)
  }

  test("pmiBigrams: the planted phrase wins; hapax pairs are gated out") {
    import spark.implicits._
    // "deep learning" appears 6×; filler tokens appear everywhere
    val docs = (1 to 6).map(i => s"the deep learning run $i of the day") ++
      Seq("one unique pairing here")
    val rows = graft.llm.Collocations.pmiBigrams(docs.toDF("text"), "text",
      minCount = 5L, k = 3).collect()
    assert(rows.nonEmpty)
    assert((rows(0).getString(0), rows(0).getString(1)) ===
      (("deep", "learning")))
    assert(rows(0).getLong(2) === 6L)
    // "unique pairing" (n=1) must not appear despite maximal PMI
    assert(!rows.exists(r => r.getString(0) === "unique"))
  }

  test("flesch moments: vowel runs, sentence floor, corpus-grain score") {
    import graft.llm.TextStats
    val df = Seq(
      ("The cat sat.", 1L),     // 3 words, 1 sentence, 3 vowel runs
      ("no terminator here", 2L) // 3 words, floored to 1 sentence
    ).toDF("text", "id")
    val r = df.select(
      TextStats.nTokens(col("text")).as("w"),
      TextStats.nSentences(col("text")).as("s"),
      TextStats.nSyllables(col("text")).as("y")).collect()
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2)) === ((3L, 1L, 3L)))
    assert(r(1).getLong(1) === 1L)
    assert(Seq(("", 1L)).toDF("text", "id")
      .select(TextStats.nSentences(col("text"))).head().getLong(0) === 0L)
    // 206.835 - 1.015*(3/1) - 84.6*(3/3) = 119.19
    val f = df.where(col("id") === 1L).select(
      TextStats.fleschOf(TextStats.nTokens(col("text")),
        TextStats.nSentences(col("text")),
        TextStats.nSyllables(col("text")))).head().getDouble(0)
    assert(f === 119.19)
  }
}
