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

  test("the only cartesian-shaped joins are the documented ones") {
    // brute-force kNN (exactness baseline); single-row broadcast totals
    // in tfidf (corpus doc count), PSI/KS drift (grid totals), chi-square
    // (marginals), cms (the 1-row sketch+N frame), and the LM model's
    // corpus totals; bm25 (1-row corpus stats) and log-odds (1-row
    // side totals); and the sketch-overlap pair join (non-equi over the
    // |sources|-row SKETCH frame, never data grain). Anything else is a
    // regression.
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val p = plan(name)
      p.contains("CartesianProduct") ||
        (p.contains("BroadcastNestedLoopJoin") &&
          !Set("knn_cosine_brute", "tfidf_top_terms", "price_drift_psi",
            "chi2_priority_status", "cms_brand_counts", "lm_quality_score",
            "source_overlap_sketch", "cms_join_size", "ks_price_drift",
            "sparse_cosine_pairs", "bm25_top_docs", "log_odds_terms",
            // 1-row totals broadcasts: Benford's digit total, the
            // temperature mixture's corpus totals, the basket count
            "benford_order_totals", "temperature_mix_langs",
            "market_basket_brands", "lang_id_kappa",
            "changepoint_event_volume", "collocations_pmi",
            // V×V state-grid build + 1-row V broadcast — never data grain
            "user_sequence_likelihood",
            // 1-row total/entropy broadcasts over the confusion grid
            "lang_source_mi",
            // bounded eval slices of the embeddings table, never corpus
            // grain: PQ scores broadcast queries against coded rows,
            // RBO builds the brute baseline, JL pairs the 32-vector
            // eval slice
            "knn_cosine_pq", "ann_rbo_eval", "jl_projection_pairs",
            // 1-row max-renormalizer broadcasts over the dims-grain grid
            "pca_top_component",
            // 1-row (N, G) totals broadcast onto the category grain
            "target_encode_brand",
            // 1-row totals/bounds broadcasts onto bounded grains: the
            // bin grid (MI), the source table (quota), the brand table
            // (pareto), the year-bounds + priority mix (shift)
            "qty_price_mi_binned", "quota_alloc_sources",
            "pareto_80_20_brands", "priority_mix_shift")(name))
    }
    assert(offenders.isEmpty, s"unexpected cartesian in: $offenders")
  }
}
