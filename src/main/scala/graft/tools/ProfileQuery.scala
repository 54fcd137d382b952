package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness (not part of the driver contract, never
  * invoked by Bench/Verify): runs named [[graft.SparkEntry.queries]]
  * entries under a Spark listener and prints, per query and pass, the
  * wall time plus the number of JOBS (driver actions) and STAGES
  * (shuffle waves + result stages) the query fired. At sf0.1 the
  * mid-tail queries are fixed-overhead-bound (r12/r13 finding: action
  * count, not shuffle bytes, dominates), so job/stage counts are the
  * measurement that ranks them for optimization.
  *
  * Usage: `sbt "runMain graft.tools.ProfileQuery q1 q2 ..."`
  * (no args = a default mid-tail set).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.rdd.compress", "true")
      .config("spark.io.compression.codec", "lz4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })

    val names: Seq[String] =
      if (args.nonEmpty) args.toIndexedSeq
      else Seq("sbo_heldout_scores", "pca_top_component",
        "dsir_gumbel_sample", "dsir_importance_weights", "hybrid_rrf_docs",
        "market_basket_brands", "part_triangle_counts", "qty_price_spearman",
        "supplier_neighbor_jaccard", "containment_pairs",
        "weighted_median_price", "quantile_sketch_quantity",
        "nb_lang_confusion", "lm_quality_score", "ccnet_ppl_buckets")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    // warmup (JIT + codegen + shuffle machinery)
    graft.SparkEntry.queries("staging_events_monthly")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    for (pass <- 1 to 2) {
      println(s"== pass $pass ==")
      graft.Memos.clearAll()
      names.foreach { name =>
        val (j0, s0, k0) = (jobs.get(), stages.get(), tasks.get())
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name%-28s $dt%7.2f s  jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d tasks=${tasks.get() - k0}%5d")
      }
    }
    spark.stop()
  }
}
