package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CountMinAgg.countMinSketch
import graft.functions.CmsEstimate.cmsEstimate

/** Count-min sketch: never undercounts (even under forced collisions),
  * merge trees are partition-invariant, wide grids are exact on small
  * alphabets, and the SQL registration resolves with analysis-time type
  * checks.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 40 items over a 10-letter alphabet with skewed counts
  private val items = (0 until 40).map(i => s"item_${i % 10}")
  private def df = items.toDF("item")

  private def estimates(width: Int, depth: Int, parts: Int = 1) = {
    val sk = df.repartition(parts)
      .agg(countMinSketch(col("item"), width, depth).as("sk"))
    df.distinct()
      .join(broadcast(sk))
      .select(col("item"), cmsEstimate(col("sk"), col("item"), width, depth))
      .as[(String, Long)].collect().toMap
  }

  private val exact: Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("wide grid is exact on a small alphabet") {
    assert(estimates(width = 1024, depth = 4) === exact)
  }

  test("tiny grid forces collisions but never undercounts") {
    val est = estimates(width = 2, depth = 2)
    exact.foreach { case (k, n) => assert(est(k) >= n, k) }
    // total mass bound: any estimate ≤ full stream length
    est.values.foreach(v => assert(v <= items.size))
  }

  test("merge is partition-invariant: 8-way tree equals sequential") {
    for (w <- Seq(2, 64)) {
      assert(estimates(w, 3, parts = 8) === estimates(w, 3, parts = 1))
    }
  }

  test("nulls are skipped; estimate of an unseen item is bounded by ε·N") {
    val sk = Seq(Some("a"), None, Some("a"), Some("b")).toDF("item")
      .agg(countMinSketch(col("item"), 1024, 4).as("sk"))
    val Seq((ea, eu)) = sk.select(
        cmsEstimate(col("sk"), lit("a"), 1024, 4),
        cmsEstimate(col("sk"), lit("never_seen"), 1024, 4))
      .as[(Long, Long)].collect().toSeq
    assert(ea === 2L)       // null contributed nothing
    assert(eu <= 3L)        // at worst total mass; usually 0
  }

  test("estimate with mismatched width/depth fails loudly, never undercounts silently") {
    val sk = df.agg(countMinSketch(col("item"), 64, 3).as("sk"))
    val e = intercept[Throwable] {
      sk.select(cmsEstimate(col("sk"), lit("item_1"), 32, 3)).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("must match the sketch's build parameters"))
  }

  test("join-size estimate: exact with wide grids, never undercounts with tiny ones") {
    import graft.functions.CmsJoinSize.cmsJoinSize
    // A: a,a,b,c  B: a,b,b,d → true join size = 2·1 + 1·2 = 4
    val a = Seq("a", "a", "b", "c").toDF("k")
    val b = Seq("a", "b", "b", "d").toDF("k")
    def est(w: Int, d: Int): Long =
      a.agg(countMinSketch(col("k"), w, d).as("ska"))
        .join(b.agg(countMinSketch(col("k"), w, d).as("skb")))
        .select(cmsJoinSize(col("ska"), col("skb"), w, d))
        .as[Long].head()
    assert(est(512, 3) === 4L)        // wide grid: no collisions
    assert(est(2, 2) >= 4L)           // tiny grid: only ever overcounts
    // mismatched build parameters fail loudly
    val e = intercept[Throwable] {
      a.agg(countMinSketch(col("k"), 64, 3).as("ska"))
        .join(b.agg(countMinSketch(col("k"), 32, 3).as("skb")))
        .select(cmsJoinSize(col("ska"), col("skb"), 64, 3)).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(chain.contains("both must be built with these parameters"))
  }

  test("SQL registration works; wrong item type fails analysis") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("cms_items")
    val rows = spark.sql(
      """SELECT count_min_estimate(sk, 'item_3', 256, 3) FROM
        |  (SELECT count_min(item, 256, 3) AS sk FROM cms_items)""".stripMargin)
      .as[Long].collect()
    assert(rows.toSeq === Seq(4L))
    val e = intercept[Exception] {
      spark.sql("SELECT count_min(CAST(1 AS BIGINT), 4, 2)").collect()
    }
    assert(e.getMessage.contains("string item column"))
  }
}
