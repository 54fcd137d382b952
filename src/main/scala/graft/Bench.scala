package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every [[SparkEntry.queries]] entry against
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Robustness against a contended measurement machine (round-2 verdict:
  * the driver's recorded totals were inflated ~3× by sandbox contention
  * that did not reproduce under re-run):
  *  - every query runs TWICE in one JVM; the headline `value` and the
  *    per-query `queries` map are the per-query minimum over the passes
  *    (a query's floor is its real cost; contention only ever adds);
  *  - both raw pass totals are also emitted (`pass_totals`) so a noisy
  *    run is self-evident from the spread;
  *  - `spark.catalog.clearCache()` between queries, so a query that
  *    caches internally cannot leak blocks into its successors' memory.
  *
  * The JSON is ALSO written to `BENCH.json` (override with
  * `SPARK_GRAFT_BENCH_OUT`) because sbt wraps stdout in `[info]` prefixes
  * that defeat line-oriented parsers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // All cores unless pinned: the target env is local[32]; defaulting low
    // would serialize the bench (round 1 ran 4 cores → 2.3× the baseline).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // 3 floor samples: the headline is min-over-passes, and on a
    // contended machine two samples still let one noisy pass dominate a
    // query's floor (pass_totals regularly show a 1.3-3× spread here)
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + shuffle machinery otherwise land on
    // whichever query happens to run first (~4s of noise on a cold JVM).
    try SparkEntry.queries("staging_events_monthly")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // elapsed seconds, plus whether the query actually succeeded: a pass
    // where a query fails fast (transient OOM, missing file) must NOT
    // feed its small failure time into the min-over-passes below — that
    // would silently deflate the headline total.
    def runPass(): Map[String, (Double, Boolean)] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink forces full materialization of every output column
        // (count() would let Catalyst prune projection-only plans).
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        // Drop anything the query persisted: leaked cache blocks would
        // otherwise squeeze execution memory for every later query.
        spark.catalog.clearCache()
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }

    val allPasses = (1 to math.max(1, passes)).map(_ => runPass())
    // min over SUCCESSFUL passes only. A query that never succeeded has NO
    // real run time — a fail-fast error (missing file) would understate it
    // and a timeout-ish failure overstate it — so it contributes null to
    // `queries` and nothing to the headline `value`; `failures` /
    // `failed_queries` carry the incompleteness signal.
    val best: Map[String, Option[Double]] = SparkEntry.queries.keys.map { name =>
      val good = allPasses.flatMap(_.get(name)).collect { case (t, true) => t }
      name -> (if (good.nonEmpty) Some(good.min) else None)
    }.toMap
    val failedQueries = best.collect { case (name, None) => name }.toSeq.sorted
    val qs = best.map { case (k, v) =>
      s"\"" + k + "\":" + v.fold("null")(_.toString)
    }.mkString("{", ",", "}")
    val total = best.values.flatten.sum
    // The 49 s baseline (BASELINE.md) was recorded over the round-1/2
    // query set; queries added since are broken out so the baseline
    // comparison stays apples-to-apples as the surface grows.
    val addedSinceBaseline = Set(
      "pii_scrub_stats", "benchmark_contamination", "stratified_sample_stats",
      "repetition_stats", "weighted_mix_stats", "packing_plan",
      "curated_corpus_stats", "events_asof_orders_native",
      "lineitem_in_order_window", "near_dedup_survivors",
      "near_dup_clusters", "doc_chunks", "frame_sample_plan",
      "profile_lineitem", "resize_plan", "near_dup_clusters_logstar",
      "lineitem_in_order_window_native", "packing_plan_global",
      "knn_cosine_multiprobe", "heavy_hitter_brands", "knn_cosine_ivf",
      "winnow_fingerprints", "topk_docs_per_lang", "zorder_locality",
      "rollup_quarterly_from_monthly", "distinct_sketch_customers",
      "winnow_dup_pairs", "bloom_pruned_revenue", "token_entropy",
      "quantile_sketch_quantity", "snowflake_region_revenue",
      "pivot_returnflag_qty", "unpivot_order_metrics",
      "rollup_flag_status", "ntile_customers",
      "trailing_revenue_90d", "order_gap_days",
      "near_dedup_survivors_exact", "audio_window_plan",
      "curation_funnel_near", "winnow_dup_clusters", "ngram_repetition",
      "source_cap_stats", "edit_sim_pairs", "boilerplate_strip_stats",
      "semantic_dedup_stats", "scd2_customer_history",
      "snapshot_diff_customers", "order_interval_stats",
      "part_triangle_counts", "order_price_outliers", "pps_sample_orders",
      "funnel_view_click_purchase", "cohort_retention_daily",
      "densified_customer_months", "price_drift_psi",
      "event_transitions", "winsorized_order_totals",
      "supplier_revenue_trend", "attribution_last_touch",
      "attribution_linear", "qty_price_correlation", "chi2_priority_status",
      "unicode_fingerprint_stats", "containment_pairs", "cms_brand_counts",
      "table_fingerprint_orders", "lm_quality_score",
      "source_overlap_sketch", "weighted_reservoir_docs",
      "price_histogram", "cms_join_size", "k_anonymity_customers",
      "ks_price_drift", "incremental_rollup_orders", "pagerank_trade_graph",
      "dataset_split_stats", "setsim_prefix_pairs", "setsim_snm_pairs",
      "sparse_cosine_pairs", "zipf_fit", "linkage_snm_scores",
      "hilbert_locality", "bm25_top_docs", "log_odds_terms",
      "equi_depth_hist_orders",
      // round 7
      "grouping_sets_lineitem", "watermark_lateness_events",
      "orc_roundtrip", "l_diversity_customers", "dp_noisy_counts_nation",
      "token_count_model", "substring_dup_spans", "substring_dup_stats",
      "temperature_mix_langs", "flesch_by_lang", "url_domain_stats",
      "benford_order_totals", "fd_audit_orders", "seasonal_indices_orders",
      "market_basket_brands", "time_weighted_value", "decayed_brand_counts",
      "jw_name_similarity", "purchase_value_auc", "changepoint_event_volume",
      "collocations_pmi", "lang_id_eval", "lang_id_kappa",
      "user_sequence_likelihood", "qty_price_spearman",
      "lang_source_mi", "length_pctl_by_source",
      "order_volume_acf", "rolling_median_supplier", "pareto_parts",
      "golden_customer_records", "knn_cosine_pq", "ann_rbo_eval",
      "jl_projection_pairs", "pca_top_component", "expectations_orders",
      "running_distinct_users", "attribution_time_decay",
      "phrase_match_docs", "funnel_time_to_convert",
      "top_brands_with_other", "nation_revenue_share",
      "weighted_median_price", "label_scatter_embeddings")
    val baselineSubsetTotal =
      best.filterNot(kv => addedSinceBaseline(kv._1)).values.flatten.sum
    val passTotals = allPasses.map(_.values.map(_._1).sum)
      .mkString("[", ",", "]")
    val failedJson = failedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_queries":${best.size},"failures":${failedQueries.size},"failed_queries":$failedJson,"baseline_subset_total":$baselineSubsetTotal,"pass_totals":$passTotals,"note":"value and per-query times are the min over successful runs across ${allPasses.size} in-JVM passes (a failed run never deflates the min; a query with no successful run is null in queries, excluded from value, and listed in failed_queries); pass_totals holds each raw pass sum (spread = machine noise); baseline_subset_total sums the original 38 queries the 49s baseline was recorded on"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(out), "UTF-8")
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
