package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executes every README "Library quickstart" snippet verbatim (same
  * calls, same argument shapes) so the documented facade can never rot:
  * if a signature changes, this spec stops compiling before the README
  * lies to a user.
  */
class QuickstartSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps on running today"),
    (2L, "the quick brown fox jumps over the lazy dog and keeps on running now"),
    (3L, "the quick brown fox jumps over the lazy dog and keeps on running today"),
    (4L, "completely different text about distributed query engines at scale")
  ).toDF("doc_id", "text")

  test("quickstart: reference pipeline facade") {
    import graft.pdq.Pipeline
    val root = Files.createTempDirectory("quickstart-pdq").toString
    def write(path: String, lines: String*): String = {
      val w = new java.io.PrintWriter(path)
      lines.foreach(w.println); w.close(); path
    }
    val opDsv = write(s"$root/op.dsv",
      "OPERATOR_NO}OPERATOR_NAME}CYCLE_YEAR}CYCLE_MONTH}CYCLE_YEAR_MONTH}OPER_OIL_PROD_VOL}OPER_GAS_PROD_VOL}OPER_COND_PROD_VOL}OPER_CSGD_PROD_VOL",
      "123456}ACME OPERATING CO}2024}01}202401}1500.25}32000}0}12.5")
    val leaseDsv = write(s"$root/lease.dsv",
      "OPERATOR_NO}DISTRICT_NO}FIELD_NO}LEASE_NO}LEASE_NAME}CYCLE_YEAR}CYCLE_MONTH}CYCLE_YEAR_MONTH}OIL_PROD_VOL}GAS_PROD_VOL}COND_PROD_VOL}CSGD_PROD_VOL}LEASE_OIL_PROD_VOL}LEASE_GAS_PROD_VOL}LEASE_COND_PROD_VOL}LEASE_CSGD_PROD_VOL",
      "123456}08}54321}11111}SMITH UNIT}2024}01}202401}}}}}1500.25}32000}0}12.5")
    // README: whole reference DAG for one month -> warehouse + DQ counts
    val dq = Pipeline.runMonth(spark, opDsv, leaseDsv, s"$root/wh", 202401)
    assert(dq.negativeOperator === 0 && dq.rollupMismatches === 0)
  }

  test("quickstart: dedup family") {
    import graft.llm.Dedup
    // README: exact dedup, deterministic survivor
    val unique = Dedup.dropExactDups(docs, "doc_id", "text")
    assert(unique.count() === 3) // doc 3 is an exact copy of doc 1
    // README: near-dup clusters via the default alternating-star closure
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text")
    assert(clusters.where(col("cluster_id") === 1L).count() >= 2)
  }

  test("quickstart: curation funnel") {
    import graft.llm.Curation
    // README: quality/lang/dedup/sample funnel
    val corpus = Curation.curateCorpus(docs, "doc_id", "text", minQuality = 0.1)
    assert(corpus.columns.contains("quality_score") &&
      corpus.columns.contains("lang_pred"))
    assert(corpus.count() >= 1)
  }

  test("quickstart: source caps, boilerplate, incremental + semantic dedup, edit verify") {
    import graft.llm.{Boilerplate, Curation, Dedup, IncrementalDedup}
    val sourced = docs.withColumn("source", lit("src-a"))
    // README: per-source cap (bounded-heap selection)
    val capped = Curation.sourceCap(sourced, "doc_id", "source", cap = 2)
    assert(capped.count() === 2)
    // README: boilerplate-line stripping
    val multiline = Seq((1L, "chrome line\nbody one"), (2L, "chrome line\nbody two"))
      .toDF("doc_id", "text")
    val clean = Boilerplate.stripBoilerplate(multiline, "doc_id", "text", minDocs = 2)
    assert(clean.select("text").as[String].collect().toSet ===
      Set("body one", "body two"))
    // README: incremental dedup against the fingerprint index
    val idx = Files.createTempDirectory("quickstart-inc").toString + "/fp_index"
    val batch = docs
    val fresh = IncrementalDedup.ingestBatch(spark, batch, "doc_id", "text",
      idx, batchId = 42L)
    assert(fresh.count() === 3) // doc 3 is an exact copy of doc 1
    // README: SemDeDup survivors over trained centroids
    val embeddings = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f))
    ).toDF("id", "embedding")
    import graft.llm.Similarity
    val cents = Similarity.kMeansCentroids(embeddings, "id", "embedding", k = 2)
    val semantic = Dedup.semanticDedupSurvivors(embeddings, "id", "embedding",
      cents, threshold = 0.95)
    assert(semantic.count() <= 3)
    // README: edit-distance confirmation of candidate pairs
    val candidatePairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val verified = Dedup.editDistancePairs(docs, "doc_id", "text",
      candidatePairs, prefixLen = 256, minNormSim = 0.8)
    assert(verified.count() === 1) // docs 1 and 3 are identical
  }

  test("quickstart: similarity search") {
    import graft.llm.Similarity
    val embeddings = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(0.9f, 0.1f, 0f), 0),
      (3L, Array(0f, 1f, 0f), 0), (4L, Array(0f, 0f, 1f), 1)
    ).toDF("id", "embedding", "bucket")
    val queries = embeddings.where(col("id") === 1L)
      .select(col("id").as("qid"), col("embedding"), col("bucket"))
    // README: bucketed ANN top-k (brute-force twin: Similarity.knnBrute)
    val topk = Similarity.knnBucketed(queries, embeddings,
      "qid", "id", "embedding", "bucket", k = 2)
    assert(topk.orderBy("rank").select("neighbor_id").as[Long].collect()
      .toSeq === Seq(2L, 3L))
    // README: multi-probe sign-LSH variant
    val topkMp = Similarity.knnMultiProbe(queries, embeddings,
      "qid", "id", "embedding", k = 2, bits = 3, nProbes = 2)
    assert(topkMp.count() === 2)
    // README: IVF with a trained coarse quantizer
    val cents = Similarity.kMeansCentroids(embeddings, "id", "embedding", k = 3)
    val topkIvf = Similarity.knnIvf(queries, embeddings,
      "qid", "id", "embedding", cents, k = 2, nProbes = 2)
    assert(topkIvf.count() >= 1)
  }

  test("quickstart: heavy-hitters sketch aggregate") {
    import graft.functions.HeavyHittersAgg
    val langs = Seq("en", "en", "en", "de", "fr").toDF("lang")
    // README: mergeable Misra-Gries frequent items
    val hot = langs.agg(HeavyHittersAgg.heavyHitters(col("lang"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est_count"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hot.head === ("en", 3L))
  }

  test("quickstart: top-k heap, winnowing, z-order layout") {
    import graft.functions.TopKAgg
    import graft.llm.TextStats
    import graft.sinks.ZOrder
    // README: exact top-k per group as a bounded heap
    val docsWithLen = docs.withColumn("n_tokens", TextStats.nTokens(col("text")))
      .withColumn("lang", lit("en"))
    val longest = docsWithLen.groupBy(col("lang"))
      .agg(TopKAgg.topK(col("doc_id").cast("string"), col("n_tokens"), 5).as("top"))
    assert(longest.select(explode(col("top"))).count() === 4)
    // README: winnowing fingerprints share a fp across shared spans
    val fps = TextStats.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
    assert(fps.where(col("doc_id") === 1L).count() > 0)
    // README: z-order clustered write
    val fact = Seq((1L, 10L, 5L), (2L, 20L, 6L)).toDF("v", "part_id", "supp_id")
    val zroot = Files.createTempDirectory("quickstart-z").toString
    ZOrder.writeClustered(fact, s"$zroot/fact_z", "part_id", "supp_id", numFiles = 2)
    assert(spark.read.parquet(s"$zroot/fact_z").count() === 2)
  }

  test("quickstart: re-aggregation, bloom pruning, stream join") {
    import graft.ops.{BloomPrune, Reagg}
    import graft.streaming.StreamJoin
    // README: coarsen a pre-aggregate
    val monthly = Seq((20241, "g1", 5L, 9L), (20241, "g1", 7L, 11L))
      .toDF("quarter", "g", "n_orders", "total")
      .withColumn("latest", col("total"))
    val quarterly = Reagg.coarsen(monthly, Seq(col("quarter"), col("g")),
      sums = Seq("n_orders", "total"), maxs = Seq("latest"))
    assert(quarterly.collect()(0).getLong(2) === 12L)
    // README: bloom-pruned join
    val lineitems = Seq((1L, 10.0), (2L, 20.0)).toDF("l_orderkey", "price")
    val bigOrders = Seq((1L, "HIGH")).toDF("o_orderkey", "prio")
    val hot = BloomPrune.bloomPrunedJoin(lineitems, bigOrders,
      "l_orderkey", "o_orderkey")
    assert(hot.count() === 1)
    // README: stream-join signature works in its batch-twin form
    val clicks = Seq((7L, "2024-01-01 10:00:00", "c1")).toDF("user_id", "t", "click")
      .select(col("user_id"), to_timestamp(col("t")).as("click_ts"), col("click"))
    val imps = Seq((7L, "2024-01-01 10:05:00", "i1")).toDF("user_id", "t", "imp")
      .select(col("user_id"), to_timestamp(col("t")).as("imp_ts"), col("imp"))
    val attributed = StreamJoin.joinWithinTime(clicks, imps, Seq("user_id"),
      "click_ts", "imp_ts", watermarkDelay = "1 hour", bound = "10 minutes")
    assert(attributed.count() === 1)
  }

  test("quickstart: quantile cube, skew report, pagerank") {
    import graft.functions.QuantileSketch
    import graft.ops.{PageRank, Skew}
    // README: mergeable quantile cube
    val fact = Seq((202401, 10L, 1.0), (202401, 10L, 9.0), (202402, 11L, 5.0))
      .toDF("yyyymm", "part_id", "qty")
    val slices = fact.groupBy(col("yyyymm"))
      .agg(QuantileSketch.quantileSketch(col("qty")).as("sk"))
    val p99 = slices.agg(QuantileSketch.mergeQuantileSketches(col("sk")).as("sk"))
      .select(QuantileSketch.sketchQuantile(col("sk"), 0.99).as("p99"))
      .collect()(0).getDouble(0)
    assert(p99 >= 5.0 && p99 <= 9.0)
    // README: one-pass skew report
    val hotKeys = Skew.report(fact, "part_id", topN = 5)
    assert(hotKeys.collect().head.getString(0) === "10")
    // README: pagerank over a link graph
    val links = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val ranks = PageRank.ranks(links, "src", "dst")
    assert(ranks.count() === 3)
  }

  test("quickstart: as-of and interval joins") {
    import graft.ops.{AsOf, RangeJoin}
    val events = Seq((7L, 100L, "e1"), (7L, 300L, "e2")).toDF("user_id", "t", "ev")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"), col("ev"))
    val dims = Seq((7L, 50L, "v1"), (7L, 200L, "v2")).toDF("user_id", "vf", "snap")
      .select(col("user_id"), timestamp_micros(col("vf")).as("valid_from"), col("snap"))
    // README: latest dim row at-or-before each event (native merge exec)
    val snap = AsOf.asofJoinNative(events, dims, Seq("user_id"), "ts", "valid_from")
    assert(snap.orderBy("ts").select("snap").as[String].collect()
      .toSeq === Seq("v1", "v2"))

    val points = Seq((1L, 10L, "p")).toDF("k", "t", "tag")
      .select(col("k"), timestamp_micros(col("t")).as("ts"), col("tag"))
    val windows = Seq((1L, 5L, 15L, "w")).toDF("k", "s", "e", "win")
      .select(col("k"), timestamp_micros(col("s")).as("win_start"),
        timestamp_micros(col("e")).as("win_end"), col("win"))
    // README: rows inside [start, end] per key (native sweep exec)
    val within = RangeJoin.intervalJoinNative(points, windows, Seq("k"),
      "ts", "win_start", "win_end")
    assert(within.count() === 1)
  }

  test("quickstart: idempotent month-slice sink") {
    import graft.sinks.Idempotent
    val root = Files.createTempDirectory("quickstart-sink").toString
    val fact = Seq((1L, 202401, 10.0), (2L, 202402, 20.0))
      .toDF("id", "yyyymm", "value")
    // README: overwrite exactly the months present in the frame
    Idempotent.writeMonthSlice(fact, s"$root/fact_monthly")
    Idempotent.writeMonthSlice(fact.where(col("yyyymm") === 202401),
      s"$root/fact_monthly") // re-run one month: no double-count
    assert(spark.read.parquet(s"$root/fact_monthly").count() === 2)
  }

  test("quickstart: SCD2 history, snapshot diff, intervals, outliers, PPS") {
    import graft.sinks.Scd2
    import graft.ops.{Anomaly, Intervals, Sampling, SnapshotDiff}
    val day1 = Seq((1L, "bronze"), (2L, "silver")).toDF("k", "tier")
    val day2 = Seq((1L, "gold"), (2L, "silver")).toDF("k", "tier")
    // README: type-2 history + as-of time travel
    val hist = Scd2.mergeSnapshot(Scd2.init(day1, lit(1)), day2,
      Seq("k"), Seq("tier"), lit(2))
    val asOfDay1 = Scd2.asOf(hist, lit(1))
    assert(asOfDay1.where(col("k") === 1L).select("tier")
      .as[String].head() === "bronze")
    // README: CDC diff in one join
    val yesterday = Seq((1L, 10L), (2L, 20L)).toDF("k", "n")
    val today = Seq((1L, 11L), (3L, 30L)).toDF("k", "n")
    val changes = SnapshotDiff.diff(yesterday, today, Seq("k"), Seq("n"))
    assert(changes.count() === 3) // update, delete, insert
    // README: sweep-line peak concurrency
    val spans = Seq(("g", 1L, 5L), ("g", 3L, 7L)).toDF("g", "s", "e")
    val peak = Intervals.peakConcurrency(spans, Seq("g"), col("s"), col("e"))
    assert(peak.select("peak_concurrent").as[Long].head() === 2L)
    // README: median/MAD outliers + systematic PPS sample
    val orders = Seq(("a", 1L, 100L), ("a", 2L, 110L), ("a", 3L, 90L),
      ("a", 4L, 9000L)).toDF("prio", "id", "cents")
    val flagged = Anomaly.flagOutliers(orders, Seq("prio"), col("cents"), k = 3.0)
    assert(flagged.where(col("is_outlier")).select("cents")
      .as[Long].collect().toSeq === Seq(9000L))
    // README: winsorized band
    val calm = Anomaly.winsorize(orders, Seq("prio"), col("cents"), 0.01, 0.99)
    assert(calm.columns.contains("winsorized"))
    val sampled = Sampling.ppsSystematic(orders, Seq("prio"), col("id"),
      col("cents"), stride = 5000000L)
    assert(sampled.columns.contains("selected"))
  }

  test("quickstart: funnel, retention, gap-fill, drift, triangles") {
    import graft.ops.{Cohorts, Drift, Funnel, GapFill, Transitions, Triangles}
    val events = Seq(
      (1L, "2024-01-01 00:00:01", "view"), (1L, "2024-01-01 00:00:02", "click"),
      (1L, "2024-01-03 00:00:03", "purchase"), (2L, "2024-01-02 00:00:01", "view"))
      .toDF("user_id", "t", "typ")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"), col("typ"))
    // README: ordered funnel + retention triangle
    val funnel = Funnel.summary(events, "user_id", "ts", "typ",
      Seq("view", "click", "purchase"))
    assert(funnel.select("n_entities").as[Long].collect().toSeq === Seq(2L, 1L, 1L))
    val retention = Cohorts.retentionDaily(events, "user_id", "ts")
    assert(retention.where(col("offset_days") === 0).count() === 2)
    // README: transition matrix
    val matrix = Transitions.transitionCounts(events, "user_id", "ts", "typ")
    assert(matrix.where(col("from_type") === "view").count() >= 1)
    // README: touch attribution (last-touch + linear split)
    import graft.ops.Attribution
    val evv = events.withColumn("value", lit(100L))
    val credited = Attribution.lastTouch(evv, "user_id", "ts", "typ",
      "value", Seq("view", "click"), "purchase", lookbackSec = 259200L)
    assert(credited.where(col("channel") === "click").count() === 1)
    val split = Attribution.linearCredit(evv, "user_id", "ts", "typ",
      "value", Seq("view", "click"), "purchase", lookbackSec = 259200L)
    assert(split.agg(sum(col("credit"))).as[Double].head() === 100.0)
    // README: calendar densification with LOCF
    val monthly = Seq(("k1", 199601, 1L, 10L), ("k1", 199603, 2L, 20L))
      .toDF("k", "yyyymm", "n", "v")
    val dense = GapFill.densifyMonths(monthly, Seq("k"), "yyyymm",
      zeroFill = Seq("n"), locf = Seq("v"))
    assert(dense.count() === 3) // 199602 generated
    // README: PSI drift gate
    val lastBatch = Seq(100L, 200L).toDF("cents")
    val thisBatch = Seq(100L, 210L).toDF("cents")
    val drift = Drift.psi(lastBatch, thisBatch, col("cents"), bucketWidth = 5000000L)
    assert(drift.select("psi").as[Double].head() === 0.0) // same bucket grid
    // README: triangle counts
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val tris = Triangles.triangleCounts(edges, "src", "dst")
    assert(tris.count() === 3)
    // README: k-core kernel (the triangle is its own 2-core)
    val kernel = graft.ops.KCore.kCoreNodes(edges, "src", "dst", k = 2)
    assert(kernel.count() === 3)
    // README: integer-exact trend slopes
    import graft.ops.{Stats, Trend}
    val slopes = Trend.linearTrend(monthly, Seq("k"), col("yyyymm"), col("v"))
    assert(slopes.columns.contains("slope"))
    // README: moment-exact inference
    val assoc = Stats.pearson(monthly, Seq("k"), col("yyyymm"), col("v"))
    assert(assoc.columns.contains("corr"))
    val indep = Stats.chiSquare(events, col("typ"), col("user_id") % 2)
    assert(indep.columns.contains("chi2"))
  }

  test("quickstart: streaming funnel") {
    import graft.streaming.FunnelStream
    val root = Files.createTempDirectory("quickstart-funnel").toString
    Seq((1L, "2024-01-01 10:00:00", "view"), (1L, "2024-01-01 10:00:30", "click"),
      (99L, "2024-01-01 12:00:00", "view"))
      .toDF("user_id", "ts_s", "typ")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("typ"))
      .write.parquet(s"$root/in/f1")
    val schema = spark.read.parquet(s"$root/in/f1").schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$root/in/*")
      // README: watermark-settled live funnel (batch-exact step reaches)
      val reaches = FunnelStream.stepReaches(stream, "user_id", "ts", "typ",
        Seq("view", "click", "purchase"), watermarkDelay = "10 minutes")
      val q = reaches.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/chk")
        .format("parquet").option("path", s"$root/out")
        .start()
      q.awaitTermination()
    }
    runOnce()
    Seq((99L, "2024-01-01 13:00:00", "view")).toDF("user_id", "ts_s", "typ")
      .select(col("user_id"), to_timestamp(col("ts_s")).as("ts"), col("typ"))
      .write.parquet(s"$root/in/f2")
    runOnce() // sentinel watermark settles user 1's events on timeout
    assert(spark.read.parquet(s"$root/out")
      .where(col("entity") === 1L).count() === 2)
  }

  test("quickstart: streaming dedup") {
    import graft.streaming.DedupStream
    val root = Files.createTempDirectory("quickstart-stream").toString
    Seq((1L, 100L, "same text"), (2L, 160L, "same  TEXT"), (3L, 200L, "other"))
      .toDF("doc_id", "t", "text")
      .select(col("doc_id"), timestamp_micros(col("t") * 1000000L).as("ts"),
        col("text"))
      .write.parquet(s"$root/in/f1")
    val schema = spark.read.parquet(s"$root/in/f1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$root/in/*")
    // README: fingerprint dedup with watermark-bounded state
    val q = DedupStream.dropDupsStream(stream, "text", "ts", "10 minutes")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .format("parquet").option("path", s"$root/out")
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$root/out").count() === 2) // dup dropped
  }

  test("quickstart: substring spans, collocations, temperature mix") {
    import graft.llm.{SubstringDedup, Collocations}
    // README: duplicated-passage spans at w=5 (docs 1-3 share text)
    val spans = SubstringDedup.dupSpans(docs, "doc_id", "text", w = 5)
    assert(spans.count() >= 3)
    // README: PMI phrase mining with the min-count gate
    val phrases = Collocations.pmiBigrams(docs, "text", minCount = 2L, k = 10)
    assert(phrases.count() >= 1 && phrases.columns.contains("pmi"))
    import graft.llm.Curation.temperatureAllocation
    val corpusStats = Seq(("en", 900L), ("de", 100L)).toDF("lang", "n_tokens")
    // README: α-flattened sampling design table
    val mix = temperatureAllocation(corpusStats, "lang", "n_tokens",
      alpha = 0.3, budgetTokens = 1000000L)
    assert(mix.columns.contains("epochs") && mix.count() === 2)
  }

  test("quickstart: urls, basket, change point, decay, eval") {
    import graft.ops.{Urls, Basket, ChangePoint, Decay, Eval}
    val pages = Seq("http://A.com/x?utm_source=1", "http://a.com:80/x/",
      "https://b.co.uk/y").toDF("url")
    // README: canonical URL + registered-domain rollup
    val domains = Urls.domainStats(pages, "url")
    assert(domains.count() === 2)
    val lines = Seq((1L, "B1"), (1L, "B2"), (2L, "B1"), (2L, "B2"),
      (3L, "B3")).toDF("order_id", "brand")
    // README: basket association with the size cap
    val assoc = Basket.coOccurrence(lines, "order_id", "brand")
    assert(assoc.count() === 1)
    val daily = (0 until 20).map(t => (t.toLong, if (t < 10) 10L else 30L))
      .toDF("day", "n")
    // README: the change-point scan
    val cp = ChangePoint.meanShiftScan(daily, "day", "n")
    assert(cp.head().getLong(0) === 9L)
    val sales = Seq(("b", "2024-06-20"), ("b", "2024-06-30"))
      .toDF("brand", "d").select(col("brand"), col("d").cast("date").as("d"))
    // README: half-life decayed counts
    val fresh2 = Decay.decayedCounts(sales, Seq("brand"), col("d"),
      asOf = "2024-06-30", halfLifeDays = 30.0)
    assert(fresh2.head().getLong(1) === 2L)
    val preds = Seq(("a", "a"), ("a", "b"), ("b", "b")).toDF("label", "pred")
    // README: the classifier-eval trio
    val prf = Eval.classStats(preds, col("label"), col("pred"))
    assert(prf.count() === 2)
    val agreement = Eval.cohenKappa(preds, col("label"), col("pred"))
    assert(!agreement.head().isNullAt(3))
    val scored = Seq((10L, true), (1L, false)).toDF("score", "y")
    val rankQ = Eval.aucMannWhitney(scored, col("score"), col("y"))
    assert(rankQ.head().getDouble(2) === 1.0)
  }

  test("quickstart: jaro-winkler expression and the drift monitor") {
    import graft.functions.JaroWinklerSim
    val namePairs = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
    // README: native Jaro-Winkler
    val sim = namePairs.select(JaroWinklerSim.jaroWinkler(col("a"), col("b")))
    assert(math.abs(sim.head().getDouble(0) - 0.9611111111111111) < 1e-12)

    import graft.streaming.DriftMonitor
    val root = Files.createTempDirectory("quickstart-drift").toString
    val reference = Seq(100L, 200L, 300L).toDF("cents")
    Seq(105L, 205L, 305L).toDF("cents").write.parquet(s"$root/in/f1")
    val schema = spark.read.parquet(s"$root/in/f1").schema
    val stream2 = spark.readStream.schema(schema).parquet(s"$root/in/*")
    // README: per-micro-batch PSI gate
    val monitor = DriftMonitor.psiWriter(stream2, reference, "cents",
      bucketWidth = 5000000L, metricsPath = s"$root/drift_metrics")
    val q2 = monitor
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/chk")
      .start()
    q2.awaitTermination()
    assert(spark.read.parquet(s"$root/drift_metrics").count() === 1)
  }

  test("quickstart: graph scores, curation cuts, compaction planning") {
    import graft.ops.{Bfs, Communities, Compaction, Hits}
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L), (3L, 12L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    // README: hub/authority, communities, hop depths
    val ha = Hits.scoresFixedPoint(edges, "src", "dst", iters = 3)
    assert(ha.columns.toSeq === Seq("id", "hub_fp", "auth_fp"))
    assert(ha.count() === 6)
    val comm = Communities.labelPropagation(edges, "src", "dst", iters = 3)
    assert(comm.count() === 6)
    val depths = Bfs.depths(edges, "src", "dst", seeds, "id", maxDepth = 3)
    assert(depths.where(col("depth") === 1L).count() === 2) // 10 and 11

    import graft.llm.Curation
    val docs = Seq(("s1", 1L, 60L), ("s1", 2L, 30L), ("s1", 3L, 10L),
      ("s2", 4L, 5L)).toDF("source", "doc_id", "n_chars")
    // README: nucleus cut + exact quotas
    val best = Curation.nucleusSelect(docs, "source", "doc_id", "n_chars",
      pMicro = 500000L)
    assert(best.where(col("source") === "s1").count() === 1) // 60 covers half
    val quotas = Curation.quotaAllocate(docs, "source", "n_chars",
      budget = 100000L)
    assert(quotas.agg(sum(col("alloc"))).head().getLong(0) === 100000L)

    // README: compaction planning
    val inventory = Seq(("p", "a", 100L), ("p", "b", 100L), ("p", "c", 50L))
      .toDF("part", "file", "bytes")
    val bins = Compaction.planSummary(inventory, "part", "file", "bytes",
      targetBytes = 134217728L)
    assert(bins.count() === 1) // everything fits one target bin
  }
}
