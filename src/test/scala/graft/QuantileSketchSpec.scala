package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.QuantileSketch._

/** Mergeable GK quantile sketches: rank-error bound against exact
  * quantiles, the bound surviving a slice→merge tree, shuffle-forced
  * partial merges, and null/empty edges.
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 10k values with duplicates and skew; exact rank checks need the
  // sorted array
  private val values: IndexedSeq[Double] =
    (0 until 10000).map(i => ((i * 7919) % 1000).toDouble / 7.0)
  private lazy val sorted = values.sorted

  /** Exact rank window: an estimate for percentile p with relative
    * error e must lie between the values at ranks (p ± e)·n.
    */
  private def inRankWindow(est: Double, p: Double, e: Double): Boolean = {
    val n = sorted.size
    val lo = sorted(math.max(0, ((p - e) * n).toInt - 1))
    val hi = sorted(math.min(n - 1, ((p + e) * n).toInt + 1))
    est >= lo && est <= hi
  }

  test("single sketch: estimates inside the GK rank window at every decile") {
    val err = 0.01
    val sk = values.toDF("v").repartition(7) // forced partial merges
      .agg(quantileSketch(col("v"), err).as("sk"))
    val df = sk.select((1 to 9).map(d =>
      sketchQuantile(col("sk"), d / 10.0).as(s"p$d")): _*).collect()(0)
    (1 to 9).foreach { d =>
      val est = df.getDouble(d - 1)
      assert(inRankWindow(est, d / 10.0, err),
        s"p${d * 10} estimate $est outside the rank window")
    }
  }

  test("slice -> merge tree keeps the rank bound (the pre-aggregate cube path)") {
    val err = 0.01
    // 10 slices sketched independently, merged at report time
    val slices = values.zipWithIndex.map { case (v, i) => (i % 10, v) }
      .toDF("slice", "v")
    val perSlice = slices.groupBy(col("slice"))
      .agg(quantileSketch(col("v"), err).as("sk"))
    val merged = perSlice.agg(mergeQuantileSketches(col("sk"), err).as("sk"))
      .select(sketchQuantile(col("sk"), 0.5).as("p50"),
        sketchQuantile(col("sk"), 0.9).as("p90")).collect()(0)
    // GK merge doubles the error bound in the worst case; test at 2e
    assert(inRankWindow(merged.getDouble(0), 0.5, 2 * err))
    assert(inRankWindow(merged.getDouble(1), 0.9, 2 * err))
  }

  test("a two-level merge tree (slices -> groups -> total) keeps the bound") {
    val err = 0.01
    val sliced = values.zipWithIndex.map { case (v, i) => (i % 100, v) }
      .toDF("slice", "v")
    val level1 = sliced.groupBy(col("slice"))
      .agg(quantileSketch(col("v"), err).as("sk"))
    val level2 = level1.groupBy((col("slice") % 10).as("grp"))
      .agg(mergeQuantileSketches(col("sk"), err).as("sk"))
    val total = level2.agg(mergeQuantileSketches(col("sk"), err).as("sk"))
      .select(sketchQuantile(col("sk"), 0.5).as("p50")).collect()(0).getDouble(0)
    // mergeable-summaries: bounds compose over the TREE depth, not the
    // slice count — test at the two-merge-level bound
    assert(inRankWindow(total, 0.5, 3 * err), s"p50 $total out of window")
  }

  test("nulls are skipped; an empty sketch queries to null") {
    val withNulls = Seq(Some(1.0), None, Some(3.0), None).toDF("v")
    val p50 = withNulls.agg(quantileSketch(col("v")).as("sk"))
      .select(sketchQuantile(col("sk"), 0.5)).collect()(0).getDouble(0)
    assert(p50 >= 1.0 && p50 <= 3.0)
    val emptySk = Seq.empty[Double].toDF("v")
      .agg(quantileSketch(col("v")).as("sk"))
      .select(sketchQuantile(col("sk"), 0.5)).collect()(0)
    assert(emptySk.isNullAt(0))
  }
}
