package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Curation, TextStats}

/** Corpus-curation operators: PII scrubbing, contamination detection,
  * deterministic stratified sampling, repetition ratios.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("scrubPii redacts emails, phones, IPs, and card-length digit runs") {
    val df = Seq(
      "mail me at jane.doe+spam@corp.example.co.uk today",
      "call (512) 555-0142 or 1-800-555-0199 now",
      "server 192.168.10.254 answered",
      "card 4111111111111111 leaked",
      "clean text with number 42 and version 1.2.3"
    ).toDF("t").select(Curation.scrubPii(col("t")).as("s"))
    val out = df.as[String].collect()
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1) === "call <PHONE> or <PHONE> now")
    assert(out(2) === "server <IP> answered")
    assert(out(3) === "card <LONGNUM> leaked")
    // no false positives on ordinary text / short numbers / semver
    assert(out(4) === "clean text with number 42 and version 1.2.3")
  }

  test("redactionCount counts placeholders exactly") {
    val df = Seq("a@b.co and c@d.org plus 10.0.0.1").toDF("t")
      .select(Curation.scrubPii(col("t")).as("s"))
      .select(
        Curation.redactionCount(col("s"), "<EMAIL>").as("e"),
        Curation.redactionCount(col("s"), "<IP>").as("i"),
        Curation.redactionCount(col("s"), "<PHONE>").as("p"))
    val r = df.collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L && r.getLong(2) === 0L)
  }

  test("contamination flags only docs sharing enough shingles") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words about spark plans"),
      (3L, "the quick brown fox naps all day")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val hits = Curation.contamination(corpus, bench, "doc_id", "text", minShared = 2)
      .orderBy("corpus_id").collect()
    // doc 1 shares "the quick brown","quick brown fox","brown fox jumps";
    // doc 3 shares the first two; doc 2 shares none
    assert(hits.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(hits(0).getLong(2) === 3L)
    assert(hits(1).getLong(2) === 2L)
  }

  test("contamination joins the corpus against a BROADCAST benchmark side") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("id", "text")
    val bench = Seq((10L, "alpha beta gamma delta")).toDF("id", "text")
    val plan = Curation.contamination(corpus, bench, "id", "text")
      .queryExecution.executedPlan.toString
    // the shingle-grain join must never shuffle the exploded corpus —
    // the benchmark side is hinted broadcast regardless of the planner's
    // fan-out-inflated size estimate
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("contamination maxBenchDf drops stopword-like shingles shared across the benchmark") {
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // "alpha beta gamma" appears in ALL three bench docs (df=3); the
    // distinctive tail shingle appears in one
    val bench = Seq(
      (100L, "alpha beta gamma one"),
      (101L, "alpha beta gamma two"),
      (102L, "alpha beta gamma delta")
    ).toDF("doc_id", "text")
    val uncapped = Curation.contamination(corpus, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // every bench doc matches via the common shingle; 102 also via the tail
    assert(uncapped === Set((100L, 1L), (101L, 1L), (102L, 2L)))
    val capped = Curation.contamination(corpus, bench, "doc_id", "text",
        minShared = 1, maxBenchDf = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // the df=3 shingle is dropped; only the distinctive match survives
    assert(capped === Set((102L, 1L)))
  }

  test("stratifiedSample is deterministic, per-stratum, and roughly proportional") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "grp")
    val fr = Map("a" -> 0.5, "b" -> 0.1)
    val s1 = Curation.stratifiedSample(df, "id", "grp", fr)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val s2 = Curation.stratifiedSample(df, "id", "grp", fr)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 === s2) // same rows every run
    val aKept = s1.count(_._2 == "a").toDouble / 2000
    val bKept = s1.count(_._2 == "b").toDouble / 2000
    assert(math.abs(aKept - 0.5) < 0.05, s"a kept $aKept")
    assert(math.abs(bKept - 0.1) < 0.05, s"b kept $bKept")
    // unlisted strata keep nothing
    val s3 = Curation.stratifiedSample(df, "id", "grp", Map("a" -> 0.5))
    assert(s3.where($"grp" === "b").count() === 0)
    // different seed → different sample
    val s4 = Curation.stratifiedSample(df, "id", "grp", fr, seed = 999L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s4 !== s1)
  }

  test("sampleBucket: engine-portable (DuckDB parity), full-width id mixing, no overflow") {
    import java.sql.DriverManager
    // ids that stress the arithmetic: 0, small, pairs congruent mod the
    // old 1000003 pre-reduction modulus (which forced identical keep
    // decisions before the two-prime mix), and ids near the 2^62 bound
    val ids = Seq(0L, 1L, 42L, 1000003L, 2000006L, 77L, 77L + 1000003L,
      2147483646L, 2147483647L, 2147483648L,
      (1L << 61) - 1, (1L << 62) - 3, (1L << 62) - 1)
    val df = ids.toDF("id")
    val got = df.select(col("id"), Curation.sampleBucket(col("id"), 12345L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // DuckDB evaluates the SQL twin to the same buckets (it would RAISE,
    // not wrap, on 64-bit overflow — so parity also proves in-range math)
    Class.forName("org.duckdb.DuckDBDriver")
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val sql = ids.map(i =>
        s"SELECT CAST($i AS BIGINT) AS id, ${Curation.sampleBucketSql(s"CAST($i AS BIGINT)", 12345L)} AS b")
        .mkString(" UNION ALL ")
      val rs = conn.createStatement().executeQuery(sql)
      while (rs.next()) assert(rs.getLong(2) === got(rs.getLong(1)),
        s"duckdb bucket mismatch for id=${rs.getLong(1)}")
    } finally conn.close()

    // the old scheme's failure mode is gone: ids congruent mod 1000003
    // now land in different buckets (full 64-bit id influences the hash)
    assert(got(1000003L) !== got(2000006L))
    assert(got(77L) !== got(77L + 1000003L))
    assert(got.values.forall(b => b >= 0 && b < 1000000L))
  }

  test("datasetSplit: total, proportional, stable as the corpus grows, DuckDB-portable") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val df = (0L until 10000L).toDF("id")
    val got = df.select(col("id"), Curation.datasetSplit(col("id"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // total function: every id lands in exactly one split
    assert(got.size === 10000)
    val frac = got.values.groupBy(identity).view.mapValues(_.size / 10000.0)
    assert(math.abs(frac("train") - 0.8) < 0.02, s"train ${frac("train")}")
    assert(math.abs(frac("val") - 0.1) < 0.02, s"val ${frac("val")}")
    assert(math.abs(frac("test") - 0.1) < 0.02, s"test ${frac("test")}")
    // growth stability: the assignment is a pure function of (id, seed),
    // so a larger corpus never moves an existing document
    val grown = (0L until 20000L).toDF("id")
      .select(col("id"), Curation.datasetSplit(col("id"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, s) => grown(id) == s })
    // unnormalized weights mean the same proportions
    val w2 = Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0)
    val same = df.select(col("id"), Curation.datasetSplit(col("id"), w2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(same === got)

    // the SQL twin assigns identically in DuckDB
    import java.sql.DriverManager
    Class.forName("org.duckdb.DuckDBDriver")
    val conn = DriverManager.getConnection("jdbc:duckdb:")
    try {
      val sql = s"""SELECT id, ${Curation.datasetSplitSql("id", w)} AS s
                   |FROM (SELECT unnest(range(0, 10000)) AS id)""".stripMargin
      val rs = conn.createStatement().executeQuery(sql)
      var n = 0
      while (rs.next()) {
        assert(rs.getString(2) === got(rs.getLong(1)),
          s"duckdb split mismatch for id=${rs.getLong(1)}")
        n += 1
      }
      assert(n === 10000)
    } finally conn.close()
  }

  test("weightedMix: integer weights replicate exactly, fractions sample, unlisted drop") {
    val df = (0L until 1000L).map(i => (i, s"src${i % 4}")).toDF("id", "src")
    val mixed = Curation.weightedMix(df, "id", "src",
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.25))
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === 500L) // 250 rows × exactly 2
    assert(!bySrc.contains("src3")) // unlisted source dropped
    val f1 = bySrc("src1").toDouble / 250
    assert(math.abs(f1 - 0.5) < 0.15, s"src1 kept ×$f1")
    val f2 = bySrc("src2").toDouble / 250
    assert(f2 > 1.0 && math.abs(f2 - 1.25) < 0.15, s"src2 kept ×$f2")
    // deterministic: identical multiset on re-run
    val again = Curation.weightedMix(df, "id", "src",
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 1.25))
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === bySrc)
  }

  test("concatChunkPlan: offsets tile the budget, sharded form packs per shard") {
    val df = Seq((1L, 300L, "a"), (2L, 300L, "a"), (3L, 100L, "a"), (4L, 300L, "b"))
      .toDF("id", "n", "shard")
    val global = Curation.concatChunkPlan(df, "id", "n", budget = 512)
      .orderBy("id").collect()
    // starts: 0, 300, 600, 700 → chunks 0,0,1,1; offsets 0,300,88,188
    assert(global.map(_.getAs[Long]("start_offset")).toSeq === Seq(0L, 300L, 600L, 700L))
    assert(global.map(_.getAs[Long]("chunk_id")).toSeq === Seq(0L, 0L, 1L, 1L))
    assert(global.map(_.getAs[Long]("offset_in_chunk")).toSeq === Seq(0L, 300L, 88L, 188L))
    val sharded = Curation.concatChunkPlan(df, "id", "n", 512, Some("shard"))
      .orderBy("id").collect()
    // shard b restarts at offset 0
    assert(sharded.map(_.getAs[Long]("start_offset")).toSeq === Seq(0L, 300L, 600L, 0L))
  }

  test("concatChunkPlanGlobal: two-stage sharded offsets equal one global window") {
    // 60 docs, uneven token counts, 5 shards of very different weights
    // (incl. a shard with a single doc) — contiguity must hold across
    // every shard boundary
    val df = (1L to 60L).map { i =>
      (i, (i * 37) % 290 + 1, if (i == 7) 99L else i % 4)
    }.toDF("id", "n", "shard")

    val twoStage = Curation.concatChunkPlanGlobal(df, "id", "n",
        budget = 512, shardCol = "shard")
      .select("id", "start_offset", "chunk_id", "offset_in_chunk")
      .orderBy("id").collect().map(_.toSeq).toSeq
    // the semantics it must reproduce: ONE window over (shard, id) order
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("shard"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val oneWindow = df
      .withColumn("start_offset", (sum(col("n")).over(w) - col("n")).cast("long"))
      .withColumn("chunk_id", expr("start_offset div 512"))
      .withColumn("offset_in_chunk", pmod(col("start_offset"), lit(512L)))
      .select("id", "start_offset", "chunk_id", "offset_in_chunk")
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(twoStage === oneWindow)

    // offsets are globally contiguous: sorted by start_offset, each row
    // begins exactly where the previous ended
    val byOffset = Curation.concatChunkPlanGlobal(df, "id", "n", 512, "shard")
      .select(col("start_offset"), col("n")).orderBy("start_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    byOffset.sliding(2).foreach {
      case Array((s1, n1), (s2, _)) => assert(s2 === s1 + n1)
      case _ => ()
    }
  }

  test("curateCorpus funnel: filters, dedups to min id, samples deterministically") {
    // long-enough diverse text passes quality; "the/of/to..." give it
    // stopword mass
    val good = "the story of a fox and the dog is told in many words " +
      "that keep going for quite a while to clear the length floor " * 3
    val docs = Seq(
      (1L, good),
      (2L, good), // exact dup of 1 → dropped (min-id survivor)
      (3L, "tiny"), // fails the quality length floor
      (4L, ("spam " * 50).trim), // repetition ratio ~0.98 → dropped
      (5L, good + " unique tail here")
    ).toDF("doc_id", "text")
    val kept = Curation.curateCorpus(docs, "doc_id", "text",
        minQuality = 0.5, maxDupTokenRatio = 0.9, sampleFraction = 1.0)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 5L))
    val cols = Curation.curateCorpus(docs, "doc_id", "text").columns.toSeq
    assert(cols === Seq("doc_id", "text", "n_tokens", "quality_score",
      "lang_pred", "fingerprint"))
    // sampling composes: fraction 0 keeps nothing, deterministic re-run
    val none = Curation.curateCorpus(docs, "doc_id", "text",
      sampleFraction = 0.0).count()
    assert(none === 0L)
  }

  test("chunkTokens: stride windows tile the doc, tail chunk is short, empty docs drop") {
    import graft.llm.TextStats
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "solo"),
      (3L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
    val got = Curation.chunkTokens(df, "toks", size = 4, stride = 3)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    // doc 1: starts 0,3,6,9 → windows of 4 with a 1-token tail
    assert(got.toSeq === Seq(
      (1L, 0, 4L, "t1 t2 t3 t4"),
      (1L, 1, 4L, "t4 t5 t6 t7"),
      (1L, 2, 4L, "t7 t8 t9 t10"),
      (1L, 3, 1L, "t10"),
      (2L, 0, 1L, "solo")))
  }

  test("repetition ratios: diverse text low, looping text high") {
    val df = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "spam spam spam spam spam spam spam spam"),
      (3L, "a b c a b c a b c a b c"),
      (4L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), Curation.shinglesAll(col("toks")).as("sh"))
      .select(col("doc_id"),
        Curation.dupRatioOf(col("toks")).as("tok_dup"),
        Curation.dupRatioOf(col("sh")).as("sh_dup"))
      .orderBy("doc_id").collect()
    assert(df(0).getDouble(1) === 0.0 && df(0).getDouble(2) === 0.0)
    assert(df(1).getDouble(1) === 1.0 - 1.0 / 8) // one distinct token of 8
    assert(df(1).getDouble(2) === 1.0 - 1.0 / 6) // one distinct shingle of 6
    // doc 3: 3 distinct tokens of 12; shingles cycle with period 3 → 3
    // distinct of 10
    assert(math.abs(df(2).getDouble(1) - (1.0 - 3.0 / 12)) < 1e-12)
    assert(math.abs(df(2).getDouble(2) - (1.0 - 3.0 / 10)) < 1e-12)
    // empty doc: both ratios 0, no div-by-zero
    assert(df(3).getDouble(1) === 0.0 && df(3).getDouble(2) === 0.0)
  }

  test("sourceCap: exactly cap survivors per source, hash order, repartition-stable") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 40L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val kept = Curation.sourceCap(df, "doc_id", "source", cap = 3)
    // the one-task window form is the executable twin of the heap path
    val w = Window.partitionBy(col("source"))
      .orderBy(Curation.sampleBucket(col("doc_id"), 12345L), col("doc_id"))
    val expect = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).select("doc_id").as[Long].collect().toSet
    assert(kept.select("doc_id").as[Long].collect().toSet === expect)
    val perSource = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perSource === Map("s0" -> 3L, "s1" -> 3L, "s2" -> 3L, "s3" -> 3L))
    // survivors don't depend on the physical layout
    val kept2 = Curation.sourceCap(df.repartition(7), "doc_id", "source", cap = 3)
    assert(kept2.select("doc_id").as[Long].collect().toSet === expect)
    // cap at or above the group size keeps everything
    assert(Curation.sourceCap(df, "doc_id", "source", cap = 10).count() === 40L)
  }

  test("nucleusSelect keeps the least prefix crossing the mass budget") {
    // s1 scores 50, 30, 20 (total 100): p=0.5 keeps 50 (before=0) and
    // 30 (before=50·1e6 < 0.5·100·1e6? 50<50 false → excluded)... the
    // crossing rule: keep while before < p·total → exactly {50}
    val df = Seq(("s1", 1L, 50L), ("s1", 2L, 30L), ("s1", 3L, 20L),
      ("s2", 4L, 10L), ("s2", 5L, 10L))
      .toDF("src", "id", "score")
    val half = Curation.nucleusSelect(df, "src", "id", "score", 500000L)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(half.toSet === Set(("s1", 1L), ("s2", 4L)))
    // p just past one element's share pulls in the next
    val p60 = Curation.nucleusSelect(df, "src", "id", "score", 600000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(p60.filter(_._1 == "s1").map(t => (t._2, t._3)).toSet ===
      Set((1L, 1L), (2L, 2L)))
    // ties order by id; a group always keeps its first element
    assert(p60.filter(_._1 == "s2").map(_._2).toSet === Set(4L, 5L))
    val tiny = Curation.nucleusSelect(df, "src", "id", "score", 1L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(tiny === Set(("s1", 1L), ("s2", 4L)))
  }

  test("nucleusSelect survives totals past the long micro-unit envelope") {
    // before * 1e6 wraps int64 once the running prefix passes ~9.2e12
    // score units (the sf1-certification catch); the decimal(38,0)
    // cross-multiply must keep the crossing rule exact. Scores 4e12
    // each, p=0.5: prefix 0, 4e12, 8e12 vs 0.5·12e12=6e12 → keep 2.
    val big = 4_000_000_000_000L
    val df = Seq(("s", 1L, big), ("s", 2L, big), ("s", 3L, big))
      .toDF("src", "id", "score")
    val kept = Curation.nucleusSelect(df, "src", "id", "score", 500000L)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("quotaAllocate: exact budget, largest-remainder top-ups, tiebreak") {
    // weights 3:3:4 over budget 11 → floors 3,3,4 (sum 10), remainders
    // 3/10, 3/10, 4/10 scaled: 33%10=3, 33%10=3, 44%10=4 → one unit
    // left goes to the largest remainder (c)
    val df = Seq(("a", 3L), ("b", 3L), ("c", 4L)).toDF("g", "w")
    val got = Curation.quotaAllocate(df, "g", "w", budget = 11L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === Map("a" -> ((3L, 3L)), "b" -> ((3L, 3L)),
      "c" -> ((4L, 5L))))
    assert(got.values.map(_._2).sum === 11L)
    // remainder tie splits by group name: budget 10 over 1:1:1 →
    // floors 3 each, remainder tie → a gets the extra
    val tie = Curation.quotaAllocate(
        Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("g", "w"),
        "g", "w", budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(tie === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("rollingCorr: perfect frames hit ±1, degenerate frames null") {
    // y = 2x inside the frame → +1; then y flips to -x → the mixed
    // frames sit strictly between; constant-x frames → null
    val rows = Seq(("k", 1, 1L, 2L), ("k", 2, 2L, 4L), ("k", 3, 3L, 6L),
      ("k", 4, 4L, 1L), ("k", 5, 5L, 0L),
      ("c", 1, 7L, 1L), ("c", 2, 7L, 5L))
    val got = graft.ops.Windows.rollingCorr(
        rows.toDF("key", "t", "x", "y"), Seq("key"), Seq(col("t")),
        col("x"), col("y"), nRows = 3)
      .orderBy(col("key"), col("t"))
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(4)) null else r.getDouble(4).asInstanceOf[AnyRef]))
    val k = got.filter(_._1 == "k").map(_._3)
    assert(k(0) === null) // frame of 1
    assert(k(1) === 1.0 && k(2) === 1.0) // linear frames
    assert(k(3).asInstanceOf[Double] < 1.0)
    assert(k(4).asInstanceOf[Double] < 0.0) // declining tail dominates
    // constant x → zero variance → null at both c rows
    assert(got.filter(_._1 == "c").forall(_._3 == null))
  }

  test("drawdown tracks the running peak with exact cents") {
    val df = Seq(("k", 1, 100L), ("k", 2, 150L), ("k", 3, 90L),
      ("k", 4, 150L), ("k", 5, 200L))
      .toDF("key", "t", "v")
    val got = graft.ops.Windows.drawdown(df, Seq("key"), "t", "v")
      .orderBy(col("t"))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) null else r.getDouble(5).asInstanceOf[AnyRef]))
    assert(got.map(t => (t._2, t._3)).toSeq ===
      Seq((100L, 0L), (150L, 0L), (150L, 60L), (150L, 0L), (200L, 0L)))
    assert(got(2)._4 === 0.4)
  }
}
