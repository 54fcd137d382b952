package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Enforced plan shapes: PLANS_r5.md documents the load-bearing
  * physical-plan properties; this spec makes the critical ones FAIL the
  * build when a refactor regresses them — pushdown reaching the scan,
  * dims broadcasting, the brute-force cartesian staying contained, and
  * fact scans pruning to the projected columns.
  *
  * Runs against the sf0.001 testdata (plan SHAPE is scale-invariant for
  * these properties; AQE thresholds that aren't — e.g. shuffle-join
  * choices — are asserted via hints or not at all).
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(FormattedMode)
  }

  test("tfidf: the doc_id prune is pushed into the parquet scan, below the window") {
    val p = plan("tfidf_top_terms")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,50)]"),
      s"doc_id prune not pushed:\n$p")
  }

  test("star join: the dimension reaches the fact via broadcast, fact shuffles once") {
    val p = plan("star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("snowflake: both dimension hops broadcast") {
    val p = plan("snowflake_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected two broadcast hops:\n$p")
  }

  test("bloom-pruned join: the build-side filter is pushed to its scan") {
    val p = plan("bloom_pruned_revenue")
    assert(p.contains("GreaterThan(o_totalprice,400000.0)"),
      s"build filter not pushed:\n$p")
    assert(p.contains("BloomFilterMightContain") || p.contains("might_contain"),
      s"probe not bloom-filtered:\n$p")
  }

  test("zorder locality: the scan prunes to exactly the two key columns") {
    val p = plan("zorder_locality")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>"),
      s"scan reads more than the key columns:\n$p")
  }

  test("top-k agg: partial heaps run before the exchange") {
    val p = plan("topk_docs_per_lang")
    assert(p.contains("partial_top_k"), s"no map-side partial:\n$p")
  }

  test("the native queries actually run the custom execs") {
    assert(plan("events_asof_orders_native").contains("AsOfJoin"),
      "as-of native query lost its custom exec")
    assert(plan("lineitem_in_order_window_native").contains("IntervalJoin"),
      "interval native query lost its custom exec")
  }

  // ---- cartesian sweep: SHAPE-based, not name-based -------------------
  //
  // Every BroadcastNestedLoopJoin in every query plan must broadcast a
  // BOUNDED subtree — one whose row count is set by a grain reduction or
  // a literal slice, never by the data volume:
  //
  //   (a) aggregate-topped: the build side's root (descending through
  //       Project/Filter/Sort/Window/Exchange wrappers) is an Aggregate
  //       (1-row totals, bounded grids/marginals), a LocalTableScan
  //       (literal grid), or a Limit — broadcast size is bounded by the
  //       key domain / limit, independent of input rows; or
  //   (b) a literal eval slice: Project/Filter/Exchange over a parquet
  //       scan whose PUSHED data filter compares against a literal (the
  //       `vec_id < 16/32` query slices of the ANN eval family). Shape
  //       (b) is additionally restricted to the four queries that
  //       document it — a filtered data-grain scan elsewhere must fail.
  //
  // This replaces the round-≤7 query-name allowlist: a refactor inside a
  // formerly-allowlisted query that broadcasts a data-grain frame now
  // fails the sweep (proven by the deliberately-broken fixture below).

  private val sliceQueries =
    Set("knn_cosine_brute", "knn_cosine_pq", "knn_cosine_pq_refined",
      "ann_rbo_eval", "jl_projection_pairs", "hybrid_rrf_docs",
      "hard_negative_pool", "knn_cosine_sq8")

  import org.apache.spark.sql.execution.SparkPlan

  /** True iff the BNLJ build-side subtree is bounded per the rules
    * above. `allowSlice` gates shape (b).
    */
  private def boundedBuild(p: SparkPlan, allowSlice: Boolean): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Literal}
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.window.WindowExec
    p match {
      case _: BaseAggregateExec => true
      case _: LocalTableScanExec => true
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec => true
      // a cartesian of two bounded sides is bounded (e.g. a query
      // slice decorated with a broadcast 1-row stats aggregate)
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        boundedBuild(j.left, allowSlice) && boundedBuild(j.right, allowSlice)
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
        boundedBuild(b.child, allowSlice)
      case pr: ProjectExec => boundedBuild(pr.child, allowSlice)
      case f: FilterExec => boundedBuild(f.child, allowSlice)
      case s: SortExec => boundedBuild(s.child, allowSlice)
      case w: WindowExec => boundedBuild(w.child, allowSlice)
      case e: Exchange => boundedBuild(e.child, allowSlice)
      case scan: FileSourceScanExec if allowSlice =>
        // the slice must be pushed INTO the scan and compare a literal —
        // IsNotNull alone (or no pushed filter) is data grain
        scan.dataFilters.exists(_.exists {
          case b: BinaryComparison =>
            b.left.isInstanceOf[Literal] || b.right.isInstanceOf[Literal]
          case _ => false
        })
      case _ => false
    }
  }

  /** (buildSide, queryName) of every offending BNLJ/cartesian node. */
  private def unboundedJoins(sp: SparkPlan, name: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val cart = sp.collect { case c: CartesianProductExec => c }
      .map(_ => s"$name: CartesianProduct")
    val bnlj = sp.collect { case j: BroadcastNestedLoopJoinExec => j }
      .filterNot { j =>
        val build = j.buildSide match {
          case BuildLeft => j.left
          case BuildRight => j.right
        }
        boundedBuild(build, allowSlice = sliceQueries(name))
      }
      .map(j => s"$name: BNLJ with unbounded build (${j.buildSide})")
    cart ++ bnlj
  }

  test("every cartesian-shaped join broadcasts a bounded build side") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      unboundedJoins(
        SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan, name)
    }
    assert(offenders.isEmpty, s"unexpected cartesian shapes:\n  ${offenders.mkString("\n  ")}")
  }

  // ---- AQE skew-join: the 100 TB story leans on OptimizeSkewedJoin for
  // skew the salting helpers don't cover (rollup_reconcile, scd2 run
  // sort-merge joins on business keys whose hot-key distribution is
  // data-dependent). Nothing in the static plans proves the mechanism
  // engages, so this plants a hot key and asserts the ADAPTIVE final
  // plan both flags the join (isSkewJoin) and physically splits the hot
  // partition (PartialReducerPartitionSpec in the shuffle read).
  // Thresholds are lowered because detection is size-based (default
  // 256 MB per partition — a unit test can't shuffle that); factor and
  // shape are the production path, only the byte floor moves.
  test("AQE splits a planted-skew sort-merge join (the rollup/scd2 shuffle path)") {
    import org.apache.spark.sql.execution.PartialReducerPartitionSpec
    import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions._
    // collect() that descends into materialized AQE query stages (they
    // are leaf nodes to the vanilla traversal — Spark 4 wraps even the
    // result in a ResultQueryStage, hiding the whole plan)
    def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
      val kids = p match {
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++
        kids.flatMap(deepCollect(_)(pf))
    }
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // hot key 0 carries half the probe side; the payload is an md5
      // digest so the hot partition's shuffle blocks can't compress away
      // below the detection threshold (skew detection reads COMPRESSED
      // map-output sizes — 150k identical longs LZ4 to a few KB)
      val left = spark.range(0, 300000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(0, 300000).select(
        col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
        .groupBy().agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("sp"))
      joined.collect() // AQE finalizes the plan only on execution
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("no adaptive plan — AQE disabled?"))
      val finalPlan = adaptive.executedPlan
      val smjs = deepCollect(finalPlan) { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"join did not stay sort-merge:\n$finalPlan")
      assert(smjs.exists(_.isSkewJoin),
        s"OptimizeSkewedJoin did not flag the hot key:\n$finalPlan")
      val split = deepCollect(finalPlan) {
        case r: AQEShuffleReadExec if r.partitionSpecs.exists(
          _.isInstanceOf[PartialReducerPartitionSpec]) => r.partitionSpecs.count(
          _.isInstanceOf[PartialReducerPartitionSpec])
      }
      assert(split.nonEmpty && split.max > 1,
        s"hot partition was not physically split:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("the bounded-build sweep rejects a data-grain broadcast (broken fixture)") {
    import org.apache.spark.sql.functions.{broadcast, col}
    // deliberately wrong: broadcast the full lineitem scan (data grain,
    // no aggregate, no literal slice) into a nested-loop join — the
    // exact regression the sweep exists to catch
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val totals = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy().count()
    val broken = totals.join(broadcast(li.select(col("l_orderkey"))),
      totals("count") > col("l_orderkey"), "inner")
    val flagged = unboundedJoins(broken.queryExecution.sparkPlan, "fixture")
    assert(flagged.nonEmpty,
      "sweep failed to flag a broadcast data-grain scan")
    // and the same shape is ACCEPTED when named as a slice query only if
    // the scan carries a pushed literal slice — full scans still fail
    val brokenAsSlice = unboundedJoins(
      broken.queryExecution.sparkPlan, "knn_cosine_brute")
    assert(brokenAsSlice.nonEmpty,
      "slice allowance must not admit an unfiltered data-grain scan")
  }

  // ---- unpartitioned-window sweep (r13, VERDICT item 7): WindowExec
  // with no PARTITION BY moves its whole input through ONE task, so
  // every such window in every shipped plan must sit on a frame whose
  // row count a grain reduction bounds (value grid, vocabulary, bucket
  // table, percentile-range firsts) — never on data-grain rows. The r12
  // audit established this by hand over the WindowExec warnings in the
  // Verify log; this sweep makes it a build-failing invariant.
  private def boundedWindowInput(p: org.apache.spark.sql.execution.SparkPlan)
      : Boolean = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.joins._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.exchange.Exchange
    p match {
      // the wrappers boundedBuild descends — replicated here so the
      // recursion stays join-aware below them — plus a chained
      // unpartitioned window over the same bounded frame
      case w: WindowExec => boundedWindowInput(w.child)
      case pr: ProjectExec => boundedWindowInput(pr.child)
      case f: FilterExec => boundedWindowInput(f.child)
      case s: SortExec => boundedWindowInput(s.child)
      case e: Exchange => boundedWindowInput(e.child)
      // a key-join of two grain-bounded frames is grain-bounded (the
      // tick/bucket grids stitch two aggregates before their cumulative
      // window: Drift.ks' full-outer bucket join, cumulativeDistinct's
      // active⋈first-seen day join)
      case j: SortMergeJoinExec =>
        boundedWindowInput(j.left) && boundedWindowInput(j.right)
      case j: ShuffledHashJoinExec =>
        boundedWindowInput(j.left) && boundedWindowInput(j.right)
      case j: BroadcastHashJoinExec =>
        boundedWindowInput(j.left) && boundedWindowInput(j.right)
      case _ => boundedBuild(p, allowSlice = false)
    }
  }

  /** Documented data-grain global-window DEMO forms, each with a
    * scale-shaped twin or rewrite in the same surface — the sweep pins
    * the set so it can only shrink (a NEW unpartitioned data-grain
    * window anywhere else fails the build):
    * `packing_plan` is the global-window demo whose production form is
    * `packing_plan_global` (per-shard windows + broadcast shard bases;
    * its own scaladoc documents exactly this split).
    */
  private val globalWindowDemos = Set("packing_plan")

  test("every unpartitioned window in every plan runs on a grain-bounded frame") {
    import org.apache.spark.sql.execution.window.WindowExec
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(globalWindowDemos)
      .flatMap { name =>
        val sp = SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
        sp.collect {
          case w: WindowExec if w.partitionSpec.isEmpty &&
            !boundedWindowInput(w.child) =>
            s"$name: unpartitioned window over unbounded input\n${w.child.treeString.linesIterator.take(6).mkString("\n")}"
        }
      }
    assert(offenders.isEmpty,
      s"unpartitioned windows on data-grain frames:\n  ${offenders.mkString("\n  ")}")
  }

  test("the window sweep rejects a data-grain global window (broken fixture)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.window.WindowExec
    val broken = spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("rn", row_number().over(Window.orderBy(col("l_orderkey"))))
    val flagged = broken.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        !boundedWindowInput(w.child) => w
    }
    assert(flagged.nonEmpty,
      "window sweep failed to flag a global window over a raw scan")
  }

  test("the committed plan audit covers exactly the shipped query surface") {
    // round-close invariant (round-9 verdict #3): the human-readable
    // plan-audit artifact (PLANS_r*.md, graft.Explain output) must be
    // regenerated in the same change that lands any new query — a
    // stale audit silently trails the surface. The NEWEST audit file's
    // `## name` set must equal SparkEntry.queries' key set.
    val files = new java.io.File(".").listFiles()
      .filter(f => f.getName.matches("PLANS_r\\d+\\.md"))
    assert(files.nonEmpty, "no PLANS_r*.md plan-audit artifact in repo root")
    val newest = files.maxBy(f =>
      f.getName.stripPrefix("PLANS_r").stripSuffix(".md").toInt)
    val audited = scala.io.Source.fromFile(newest)(scala.io.Codec.UTF8)
      .getLines().filter(_.startsWith("## ")).map(_.drop(3).trim).toSet
    val shipped = SparkEntry.queries.keySet
    val missing = shipped -- audited
    val stale = audited -- shipped
    assert(missing.isEmpty && stale.isEmpty,
      s"plan audit ${newest.getName} drifted from the query surface — " +
        s"regenerate with `runMain graft.Explain <sfDir> ${newest.getName}`" +
        s"; missing=${missing.toSeq.sorted.take(10)} " +
        s"stale=${stale.toSeq.sorted.take(10)}")
  }
}
