package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Bucketed, Compact, Idempotent}

/** Physical-layout levers for scale: bucketed co-located joins
  * (exchange-free) and small-file compaction.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("joining two same-bucketed tables plans no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Bucketed.writeBucketed(a, "bt_a", buckets = 4, bucketCols = Seq("k"))
    Bucketed.writeBucketed(b, "bt_b", buckets = 4, bucketCols = Seq("k"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact collapses many small files to one per partition") {
    val path = Files.createTempDirectory("compact").toString + "/t"
    // simulate 5 micro-batch appends into one month partition
    (1 to 5).foreach { i =>
      Seq((i, 202401, i * 1.0), (i, 202402, i * 2.0)).toDF("k", "yyyymm", "v")
        .repartition(2)
        .write.mode("append").partitionBy("yyyymm").parquet(path)
    }
    def filesIn(month: Int) =
      new java.io.File(s"$path/yyyymm=$month").listFiles()
        .count(_.getName.endsWith(".parquet"))
    assert(filesIn(202401) >= 5)
    val before = spark.read.parquet(path).orderBy("yyyymm", "k", "v")
      .collect().map(_.toSeq).toSeq
    Compact.compact(spark, path, "yyyymm")
    assert(filesIn(202401) === 1 && filesIn(202402) === 1)
    val after = spark.read.parquet(path).orderBy("yyyymm", "k", "v")
      .collect().map(_.toSeq).toSeq
    assert(after === before)
  }
}
