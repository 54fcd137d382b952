package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Bucketed, Compact, Idempotent, ZOrder}

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

  test("zorder key: interleave math, domain guard, codegen parity") {
    import graft.functions.ZOrderKey
    // bit-level ground truth: a on even bits, b on odd bits
    assert(ZOrderKey.interleave(1L, 0L) === 1L)
    assert(ZOrderKey.interleave(0L, 1L) === 2L)
    assert(ZOrderKey.interleave(3L, 3L) === 15L)
    assert(ZOrderKey.interleave(0x7FFFFFFFL, 0L) === 0x1555555555555555L)
    assert(ZOrderKey.interleave(1L << 30, 1L << 30) === 3L << 60)
    intercept[IllegalArgumentException](ZOrderKey.interleave(-1L, 0L))
    intercept[IllegalArgumentException](ZOrderKey.interleave(0L, 1L << 31))
    // expression path: codegen and interpreted agree with the function
    val df = Seq((0L, 0L), (1L, 2L), (12345L, 678L), (0x7FFFFFFFL, 0x7FFFFFFFL))
      .toDF("a", "b")
    def run(): Seq[Long] = df
      .select(ZOrderKey.zorderKey(col("a"), col("b")))
      .as[Long].collect().toSeq
    val expected = Seq((0L, 0L), (1L, 2L), (12345L, 678L),
      (0x7FFFFFFFL, 0x7FFFFFFFL)).map { case (a, b) => ZOrderKey.interleave(a, b) }
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      assert(run() === expected)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === expected)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    // SQL surface
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder_key(3::BIGINT, 3::BIGINT)")
      .collect()(0).getLong(0) === 15L)
  }

  test("zorder3: bit model, domain guard, codegen parity, tri-dim layout") {
    import graft.functions.ZOrderKey
    // per-bit ground truth over the 21-bit domain
    val pts = Seq((0L, 0L, 0L), (1L, 2L, 4L), (12345L, 678L, 90L),
      (0x1FFFFFL, 0L, 0x1FFFFFL))
    def model(a: Long, b: Long, c: Long): Long =
      (0 until 21).map(i =>
        (((a >> i) & 1L) << (3 * i)) | (((b >> i) & 1L) << (3 * i + 1)) |
          (((c >> i) & 1L) << (3 * i + 2))).reduce(_ | _)
    pts.foreach { case (a, b, c) =>
      assert(ZOrderKey.interleave3(a, b, c) === model(a, b, c))
    }
    intercept[IllegalArgumentException](ZOrderKey.interleave3(1L << 21, 0L, 0L))
    intercept[IllegalArgumentException](ZOrderKey.interleave3(0L, -1L, 0L))
    val df = pts.toDF("a", "b", "c")
    def run(): Seq[Long] = df
      .select(ZOrderKey.zorderKey3(col("a"), col("b"), col("c")))
      .as[Long].collect().toSeq
    val expected = pts.map((model _).tupled)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      assert(run() === expected)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() === expected)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    // 16x16x16 grid into 16 files: all three dims' ranges stay tight
    val grid = for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield (x.toLong, y.toLong, z.toLong)
    val path = Files.createTempDirectory("zorder3").toString + "/t"
    ZOrder.writeClustered3(scala.util.Random.shuffle(grid).toDF("x", "y", "z"),
      path, "x", "y", "z", numFiles = 16)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"),
        (max("z") - min("z")).as("rz"))
      .collect()
    Seq(1, 2, 3).foreach { i =>
      val avg = perFile.map(_.getLong(i)).sum.toDouble / perFile.length
      assert(avg <= 10, s"dim $i avg range $avg of 15 — not clustered")
    }
  }

  test("zorder layout: per-file ranges tight on BOTH dims; 1-dim sort is not") {
    // 64×64 grid, shuffled; 16 files of ~256 cells. Ideal z-clustering
    // gives ~16×16 blocks (range ≈ 15 per dim per file); a layout sorted
    // on x alone leaves y's per-file range at the full 0..63.
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = scala.util.Random.shuffle(grid).toDF("x", "y")
    val zPath = Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.writeClustered(df, zPath, "x", "y", numFiles = 16)

    def avgRanges(path: String): (Double, Double) = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .collect()
      (perFile.map(_.getLong(1)).sum.toDouble / perFile.length,
        perFile.map(_.getLong(2)).sum.toDouble / perFile.length)
    }
    val (zx, zy) = avgRanges(zPath)
    assert(zx <= 24 && zy <= 24, s"z-layout ranges too wide: x=$zx y=$zy")
    // contrast: x-sorted layout has tight x but useless y ranges
    val xPath = Files.createTempDirectory("xsort").toString + "/t"
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(xPath)
    val (_, xy) = avgRanges(xPath)
    assert(xy >= 48, s"x-sorted layout unexpectedly tight on y: $xy")
    // clustering rewrote, not resampled: same multiset back
    assert(spark.read.parquet(zPath).orderBy("x", "y").collect().toSeq
      === df.orderBy("x", "y").collect().toSeq)
  }

  test("hilbert layout: per-file boxes at least as tight as Morton's") {
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = scala.util.Random.shuffle(grid).toDF("x", "y")
    def avgArea(path: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .collect().map(_.getLong(1))
      perFile.sum.toDouble / perFile.length
    }
    val hPath = Files.createTempDirectory("hilbert").toString + "/t"
    ZOrder.writeClusteredHilbert(df, hPath, "x", "y", numFiles = 16)
    val zPath = Files.createTempDirectory("zorder2").toString + "/t"
    ZOrder.writeClustered(df, zPath, "x", "y", numFiles = 16)
    val (ha, za) = (avgArea(hPath), avgArea(zPath))
    // each file holds 256 cells; a perfect clustering's box area is 256.
    // Hilbert's adjacency keeps every file near-perfect; Morton's
    // diagonal jumps widen some boxes. Assert both the absolute quality
    // and the ordering so a silent swap of the two curves fails.
    assert(ha <= za, s"hilbert avg box $ha wider than morton $za")
    assert(ha <= 512, s"hilbert boxes too wide: $ha")
    // rewrote, not resampled
    assert(spark.read.parquet(hPath).orderBy("x", "y").collect().toSeq
      === df.orderBy("x", "y").collect().toSeq)
  }
}
