package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Salt, Windows}

/** Window surface (latest-per-key, running totals, sessionization),
  * salted aggregation equivalence, and SQL function registration.
  */
class WindowsSaltSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("latestPerKey picks exactly one deterministic row per key") {
    val df = Seq((1, "2024-01-01", 10.0), (1, "2024-02-01", 20.0),
      (2, "2024-01-15", 5.0)).toDF("k", "d", "v")
    val out = Windows.latestPerKey(df, Seq("k"), Seq(col("d").desc))
      .orderBy("k").collect()
    assert(out.map(r => (r.getInt(0), r.getDouble(2))).toSeq ===
      Seq((1, 20.0), (2, 5.0)))
  }

  test("leadRanged is byte-identical to the single-partition global lead") {
    import org.apache.spark.sql.expressions.Window
    // non-contiguous keys with gaps, deliberately unsorted input
    val rows = (0 until 997).map(i => ((i * 37) % 9973, s"v$i"))
    val df = rows.toDF("k", "v")
    val global = df
      .withColumn("nxt", lead(col("v"), 1).over(Window.orderBy(col("k"))))
      .select("k", "v", "nxt")
    def norm(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().map(r =>
        (r.getInt(0), r.getString(1), Option(r.getString(2)))).toSeq
    val expected = norm(global)
    // numRanges below, at, and far above the row count (the last forces
    // empty ranges — the stitch must skip them to the true successor)
    for (nr <- Seq(4, 32, 2048)) {
      val got = norm(Windows.leadRanged(df, "k", "v", "nxt", numRanges = nr)
        .select("k", "v", "nxt"))
      assert(got === expected, s"numRanges=$nr diverged from global lead")
    }
  }

  test("leadRanged keeps a successor's legitimate null value (incl. at range boundaries)") {
    import org.apache.spark.sql.expressions.Window
    // every third value null — with few ranges over many rows, null
    // values land both mid-range and as a range's FIRST row, so a
    // value-coalescing stitch would wrongly substitute the next range's
    // first value for a null lead (round-9 ADVICE medium)
    val rows = (0 until 300).map(i =>
      (i * 7 % 2999, if (i % 3 == 0) null else s"v$i"))
    val df = rows.toDF("k", "v")
    val expected = df
      .withColumn("nxt", lead(col("v"), 1).over(Window.orderBy(col("k"))))
      .select("k", "v", "nxt").orderBy("k").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSeq
    for (nr <- Seq(2, 7, 64)) {
      val got = Windows.leadRanged(df, "k", "v", "nxt", numRanges = nr)
        .select("k", "v", "nxt").orderBy("k").collect()
        .map(r => (r.getInt(0), Option(r.getString(1)), Option(r.getString(2))))
        .toSeq
      assert(got === expected, s"numRanges=$nr diverged on null values")
    }
  }

  test("runningTotal accumulates in window order") {
    val df = Seq((1, 1, 10.0), (1, 2, 5.0), (1, 3, 1.0), (2, 1, 7.0))
      .toDF("k", "seq", "v")
    val out = Windows.runningTotal(df, Seq("k"), Seq(col("seq")), col("v"), "rt")
      .orderBy("k", "seq").select("rt").as[Double].collect()
    assert(out.toSeq === Seq(10.0, 15.0, 16.0, 7.0))
  }

  test("sessionize: 30-min gap starts a new session") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 10:10:00"),
      (1L, "2024-01-01 11:30:00"), // 80-min gap → session 2
      (2L, "2024-01-01 09:00:00")
    ).toDF("user_id", "ts_s")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"),
        monotonically_increasing_id().as("event_id"))
    val out = Windows.sessionize(df, "user_id", "ts",
        Seq(col("ts"), col("event_id")), 1800)
      .groupBy("user_id").agg(max("session_id").as("n"))
      .orderBy("user_id").select("n").as[Long].collect()
    assert(out.toSeq === Seq(2L, 1L))
  }

  test("saltedSum equals the direct groupBy sum") {
    val df = (1 to 1000).map(i => (i % 7, i.toDouble)).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("v"))
      .orderBy("k").as[(Int, Double)].collect().toSeq
    val salted = Salt.saltedSum(df, Seq("k"), Seq("v"), factor = 8)
      .orderBy("k").as[(Int, Double)].collect().toSeq
    assert(salted === direct)
  }

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // 90% of left rows hit one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 3, i))
      .toDF("k", "v")
    val right = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).orderBy("k", "v")
      .as[(Int, Int, String)].collect().toSeq
    val salted = Salt.saltedJoin(left, right, Seq("k"), factor = 8)
      .orderBy("k", "v").as[(Int, Int, String)].collect().toSeq
    assert(salted === plain)
    // left rows with no dim match drop in inner join both ways
    val leftOuter = Salt.saltedJoin(left, right, Seq("k"), 8, "left")
      .orderBy("k", "v").count()
    assert(leftOuter === left.count())
    // left_semi/left_anti partition the left side exactly like the plain join
    val semi = Salt.saltedJoin(left, right, Seq("k"), 8, "left_semi").count()
    val anti = Salt.saltedJoin(left, right, Seq("k"), 8, "left_anti").count()
    assert(semi === left.join(right, Seq("k"), "left_semi").count())
    assert(anti === left.join(right, Seq("k"), "left_anti").count())
    assert(semi + anti === left.count())
  }

  test("saltedJoin refuses right/full outer joins (replicas would duplicate unmatched right rows)") {
    val left = Seq((1, "a")).toDF("k", "v")
    val right = Seq((1, "x"), (2, "unmatched")).toDF("k", "name")
    val e1 = intercept[IllegalArgumentException] {
      Salt.saltedJoin(left, right, Seq("k"), 4, "right")
    }
    assert(e1.getMessage.contains("unmatched right row"))
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(left, right, Seq("k"), 4, "full_outer")
    }
    intercept[IllegalArgumentException] {
      Salt.saltedJoin(left, right, Seq("k"), 4, "outer")
    }
  }

  test("approx_count_distinct within 5% of exact (HLL sketch surface)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("SQL registration: simhash32/cosine_sim callable from spark.sql") {
    GraftFunctions.register(spark)
    Seq(("a b c d", Array(1f, 0f), Array(1f, 0f))).toDF("text", "va", "vb")
      .createOrReplaceTempView("probe")
    val r = spark.sql(
      """SELECT simhash32(split(text, ' ')) AS h,
        |       cosine_sim(va, vb) AS c,
        |       word_ngrams(split(text, ' '), 2) AS ng,
        |       minhash_sigs(word_ngrams(split(text, ' '), 2), 4) AS sigs
        |FROM probe""".stripMargin).collect()(0)
    val expect = Seq(("a b c d", 1)).toDF("text", "one").select(
      graft.llm.SimHash.simhash32(split(col("text"), " ")).as("h")).collect()(0)
    assert(r.getLong(0) === expect.getLong(0))
    assert(r.getDouble(1) === 1.0)
    assert(r.getSeq[String](2) === Seq("a b", "b c", "c d"))
    assert(r.getSeq[String](3).length === 4)
  }

  test("Reagg.coarsen: merged pre-aggregates equal direct aggregation; chains compose") {
    import graft.ops.Reagg
    val facts = (1 to 200).map { i =>
      (2024 * 10000 + (i % 6 + 1) * 100 + i % 28 + 1, s"g${i % 3}", i.toLong, i * 1.5)
    }.toDF("yyyymmdd", "g", "n", "v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("grain", "g").collect().map(_.toSeq).toSeq
    // day pre-agg -> month -> quarter, vs direct-from-facts at quarter
    val daily = facts.groupBy(col("yyyymmdd"), col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sv"),
        min(col("n")).as("mn"), max(col("n")).as("mx"))
    val monthly = Reagg.coarsen(
      daily.withColumn("yyyymm", expr("yyyymmdd div 100")),
      Seq(col("yyyymm"), col("g")),
      sums = Seq("n_rows", "sv"), mins = Seq("mn"), maxs = Seq("mx"))
    val quarterly = Reagg.coarsen(
      monthly.withColumn("grain", expr("yyyymm div 100 * 10 + (yyyymm % 100 - 1) div 3 + 1")),
      Seq(col("grain"), col("g")),
      sums = Seq("n_rows", "sv"), mins = Seq("mn"), maxs = Seq("mx"))
    val direct = facts
      .withColumn("grain",
        expr("yyyymmdd div 10000 * 10 + (yyyymmdd div 100 % 100 - 1) div 3 + 1"))
      .groupBy(col("grain"), col("g"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sv"),
        min(col("n")).as("mn"), max(col("n")).as("mx"))
    assert(snap(quarterly) === snap(direct))
  }

  test("Reagg distinct sketches: merged slices estimate identically to one sketch, within eps of exact") {
    import graft.ops.Reagg
    // 5000 distinct keys spread over 10 slices with heavy overlap
    val rows = (0 until 20000).map(i => (i % 10, (i * 7919 % 5000).toLong))
      .toDF("slice", "k")
    val perSlice = rows.groupBy(col("slice"))
      .agg(Reagg.distinctSketch(col("k")).as("sk"))
    val merged = perSlice.agg(
      Reagg.estimateDistinct(Reagg.mergeDistinctSketches(col("sk"))))
      .collect()(0).getLong(0)
    val single = rows.agg(Reagg.estimateDistinct(Reagg.distinctSketch(col("k"))))
      .collect()(0).getLong(0)
    // HLL bucket state is order-insensitive: merge-of-slices == one pass
    assert(merged === single)
    val exact = rows.select(col("k")).distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  test("BloomPrune: pruned join equals plain join; filter actually prunes; outer rejected") {
    import graft.ops.BloomPrune
    val probe = (1 to 10000).map(i => (i.toLong, i * 2.0)).toDF("pk", "v")
    val build = (1 to 10000 by 100).map(i => (i.toLong, s"b$i")).toDF("bk", "tag")
    val pruned = BloomPrune.bloomPrunedJoin(probe, build, "pk", "bk",
        expectedItems = 200L, fpp = 0.01)
      .orderBy("pk").collect().map(_.toSeq).toSeq
    val plain = probe.join(build, col("pk") === col("bk"))
      .orderBy("pk").collect().map(_.toSeq).toSeq
    assert(pruned === plain)
    assert(plain.size === 100)
    // the predicate alone keeps matches and drops ~99% of non-matches
    val bloom = BloomPrune.bloomBytes(build, "bk", 200L, 0.01)
    val kept = probe.where(BloomPrune.mightContain(bloom, col("pk"))).count()
    assert(kept >= 100 && kept < 1000, s"kept=$kept of 10000")
    intercept[IllegalArgumentException] {
      BloomPrune.bloomPrunedJoin(probe, build, "pk", "bk", joinType = "left")
    }
  }

  test("Skew.report: one hot key surfaces with share and skew floor, one pass") {
    import graft.ops.Skew
    // 5000 rows on one key + 100 keys x 10 rows: hot share ~5/6
    val rows = Seq.fill(5000)(42L) ++ (1L to 100L).flatMap(k => Seq.fill(10)(1000L + k))
    val rep = Skew.report(rows.toDF("k").repartition(8), "k", topN = 3)
      .collect()
    val hot = rep.head
    assert(hot.getString(0) === "42")
    // MG undercounts, never inflates: est <= true, and with capacity
    // 1024 >= 101 distinct the summary is exact
    assert(hot.getLong(1) === 5000L)
    assert(math.abs(hot.getDouble(2) - 5000.0 / 6000.0) < 1e-9)
    assert(hot.getDouble(3) > 50.0, s"skew floor ${hot.getDouble(3)}")
    // the tail keys are ~1x average
    rep.tail.foreach(r => assert(r.getDouble(3) < 2.0))
  }

  test("aggregate SQL surface: top_k and heavy_hitters resolve and agree with the Column API") {
    GraftFunctions.register(spark)
    Seq(("x", "a", 3L), ("x", "b", 9L), ("x", "c", 5L), ("y", "d", 1L))
      .toDF("g", "item", "m").createOrReplaceTempView("tk")
    val viaSql = spark.sql(
      "SELECT g, top_k(item, m, 2) AS top FROM tk GROUP BY g ORDER BY g")
      .select(col("g"), expr("transform(top, e -> e.item)").as("items"))
      .as[(String, Seq[String])].collect().toSeq
    assert(viaSql === Seq(("x", Seq("b", "c")), ("y", Seq("d"))))
    val hh = spark.sql(
      "SELECT heavy_hitters(item, 8) AS hh FROM tk")
      .select(expr("size(hh)")).collect()(0).getInt(0)
    assert(hh === 4)
    // wrong arity reports cleanly, not as an index error
    val ex = intercept[Exception](spark.sql("SELECT top_k(item, m) FROM tk").collect())
    assert(ex.getMessage.contains("expects 3 arguments") ||
      Option(ex.getCause).exists(_.getMessage.contains("expects 3 arguments")))
    // wrong INPUT TYPES fail at analysis with the declared signature —
    // never as a mid-job ClassCastException from update() (round-5 advice)
    val exT = intercept[Exception](
      spark.sql("SELECT top_k(m, m, 2) FROM tk").collect())
    assert(exT.getMessage.contains("top_k needs (string item, bigint metric)"),
      exT.getMessage.take(300))
    val exH = intercept[Exception](
      spark.sql("SELECT heavy_hitters(m, 8) FROM tk").collect())
    assert(exH.getMessage.contains("heavy_hitters"), exH.getMessage.take(300))
  }

  test("BloomPrune: identical key names on both sides resolve via internal aliases") {
    import graft.ops.BloomPrune
    // the common case — joining on the SAME column name — used to fail
    // analysis with an ambiguous reference before the __bp_ aliasing
    val probe = (1 to 2000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val build = (1 to 2000 by 40).map(i => (i.toLong, s"b$i")).toDF("k", "tag")
    val pruned = BloomPrune.bloomPrunedJoin(probe, build, "k", "k",
        expectedItems = 100L, fpp = 0.01)
      .select(col("__bp_l.k").as("k"), col("v"), col("tag"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    val plain = probe.alias("p").join(build.alias("b"),
        col("p.k") === col("b.k"))
      .select(col("p.k").as("k"), col("v"), col("tag"))
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(pruned === plain && plain.size === 50)
    // left_semi with equal names keeps only probe columns — no ambiguity
    val semi = BloomPrune.bloomPrunedJoin(probe, build, "k", "k",
      joinType = "left_semi", expectedItems = 100L, fpp = 0.01)
    assert(semi.columns.toSeq === Seq("k", "v") && semi.count() === 50)
  }
}
