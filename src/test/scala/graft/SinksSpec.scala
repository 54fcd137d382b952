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
}
