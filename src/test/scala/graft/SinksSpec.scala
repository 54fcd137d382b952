package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.{Idempotent, Upsert}

/** S7 idempotent month slices + S8 upsert semantics. */
class SinksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("writeMonthSlice: re-running a month replaces only that slice (S7)") {
    val path = Files.createTempDirectory("slice").toString + "/t"
    val jan = Seq((1, 202401, 10.0), (2, 202401, 20.0)).toDF("k", "yyyymm", "v")
    val feb = Seq((1, 202402, 99.0)).toDF("k", "yyyymm", "v")
    Idempotent.writeMonthSlice(jan, path)
    Idempotent.writeMonthSlice(feb, path)
    // re-run January with corrected data — February must survive
    val jan2 = Seq((1, 202401, 11.0)).toDF("k", "yyyymm", "v")
    Idempotent.writeMonthSlice(jan2, path)
    val out = spark.read.parquet(path)
    assert(out.count() === 2)
    assert(out.where($"yyyymm" === 202401).as[(Int, Double, Int)].collect().toSeq
      .map(r => (r._1, r._2)) === Seq((1, 11.0)))
    assert(out.where($"yyyymm" === 202402).count() === 1)
    // idempotency: running the same month twice ≡ once
    Idempotent.writeMonthSlice(jan2, path)
    assert(spark.read.parquet(path).count() === 2)
  }

  test("upsert merge: DO UPDATE vs DO NOTHING (S8, model_curated.py:72-101)") {
    val existing = Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("k", "name", "v")
    val incoming = Seq((2, "B2", 9.0), (3, "c", 3.0)).toDF("k", "name", "v")
    val doUpdate = Upsert.merge(existing, incoming, Seq("k"))
      .orderBy("k").as[(Int, String, Double)].collect().toSeq
    assert(doUpdate === Seq((1, "a", 1.0), (2, "B2", 9.0), (3, "c", 3.0)))
    val doNothing = Upsert.merge(existing, incoming, Seq("k"), updateOnConflict = false)
      .orderBy("k").as[(Int, String, Double)].collect().toSeq
    assert(doNothing === Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    // idempotency: merging the same delta twice ≡ once
    val twice = Upsert.merge(Upsert.merge(existing, incoming, Seq("k")), incoming, Seq("k"))
      .orderBy("k").as[(Int, String, Double)].collect().toSeq
    assert(twice === doUpdate)
  }

  test("Merge.upsertPartitions: CoW upsert touches only the batch's partitions") {
    import graft.sinks.Merge
    val path = java.nio.file.Files.createTempDirectory("merge").toString + "/t"
    def read() = spark.read.parquet(path)
      .select("k", "yyyymm", "v", "ver")
      .as[(Long, Int, String, Long)].collect().toSet

    // first write: no sink yet → plain partitioned write
    val b1 = Seq((1L, 202401, "a", 1L), (2L, 202401, "b", 1L),
      (3L, 202402, "c", 1L)).toDF("k", "yyyymm", "v", "ver")
    Merge.upsertPartitions(spark, b1, path, "yyyymm", Seq("k"), "ver")
    assert(read() === Set((1L, 202401, "a", 1L), (2L, 202401, "b", 1L),
      (3L, 202402, "c", 1L)))

    // CDC batch: update k=1, insert k=4 (both 202401); in-batch dup for
    // k=4 — highest ver wins; 202402 is untouched
    val feb = new java.io.File(s"$path/yyyymm=202402")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.lastModified).toSeq
    val b2 = Seq((1L, 202401, "a2", 2L), (4L, 202401, "d0", 2L),
      (4L, 202401, "d1", 3L)).toDF("k", "yyyymm", "v", "ver")
    Merge.upsertPartitions(spark, b2, path, "yyyymm", Seq("k"), "ver")
    assert(read() === Set((1L, 202401, "a2", 2L), (2L, 202401, "b", 1L),
      (3L, 202402, "c", 1L), (4L, 202401, "d1", 3L)))
    val febAfter = new java.io.File(s"$path/yyyymm=202402")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.lastModified).toSeq
    assert(febAfter === feb, "untouched partition was rewritten")

    // re-running the same batch is a no-op on content
    Merge.upsertPartitions(spark, b2, path, "yyyymm", Seq("k"), "ver")
    assert(read() === Set((1L, 202401, "a2", 2L), (2L, 202401, "b", 1L),
      (3L, 202402, "c", 1L), (4L, 202401, "d1", 3L)))

    // partition-moved key (k=3 jumps 202402→202403, 202402 not in batch):
    // the opt-in validator refuses — without it the stale copy survives
    val moved = Seq((3L, 202403, "c2", 2L)).toDF("k", "yyyymm", "v", "ver")
    val ex = intercept[IllegalArgumentException] {
      Merge.upsertPartitions(spark, moved, path, "yyyymm", Seq("k"), "ver",
        validateStableKeys = true)
    }
    assert(ex.getMessage.contains("partition moved"))
    // a partition-stable batch passes the validator unchanged
    Merge.upsertPartitions(spark, b2, path, "yyyymm", Seq("k"), "ver",
      validateStableKeys = true)
    assert(read() === Set((1L, 202401, "a2", 2L), (2L, 202401, "b", 1L),
      (3L, 202402, "c", 1L), (4L, 202401, "d1", 3L)))
  }

  test("Merge.upsertStream: streaming CDC feed upserts the layout per micro-batch") {
    import graft.sinks.Merge
    val root = java.nio.file.Files.createTempDirectory("mergestream").toString
    val (in, table, chk) = (s"$root/in", s"$root/table", s"$root/chk")
    def feed(name: String, rows: (Long, Int, String, Long)*): Unit =
      rows.toSeq.toDF("k", "yyyymm", "v", "ver").write.parquet(s"$in/$name")
    feed("b1", (1L, 202401, "a", 1L), (2L, 202402, "b", 1L))
    val schema = spark.read.parquet(s"$in/b1").schema
    def drain(): Unit = {
      val q = Merge.upsertStream(
        spark.readStream.schema(schema).parquet(s"$in/*"),
        table, "yyyymm", Seq("k"), "ver", chk)
      q.awaitTermination()
    }
    drain()
    def read() = spark.read.parquet(table).select("k", "yyyymm", "v", "ver")
      .as[(Long, Int, String, Long)].collect().toSet
    assert(read() === Set((1L, 202401, "a", 1L), (2L, 202402, "b", 1L)))
    // second CDC batch arrives: update k=1, insert k=3
    feed("b2", (1L, 202401, "a2", 2L), (3L, 202401, "c", 2L))
    drain()
    assert(read() === Set((1L, 202401, "a2", 2L), (2L, 202402, "b", 1L),
      (3L, 202401, "c", 2L)))
  }
}
