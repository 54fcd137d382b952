package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Casts

/** Pins the tolerant-cast semantics where the reference's two jobs
  * genuinely differ (SURVEY.md §2.2 P5 vs P6, §7.4).
  */
class CastsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edge: Seq[Option[String]] = Seq(
    Some("42"), Some(" 42 "), Some("-5"), Some("12.0"), Some(""),
    Some(" "), Some("NULL"), Some("null"), Some("NaN"), Some("nan"),
    Some("abc"), None)

  private def runInt(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Option[Int]] =
    edge.toDF("v").select(f(col("v")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq

  private def runDouble(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[Option[Double]] =
    edge.toDF("v").select(f(col("v")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq

  test("toIntStrict: digits-only (reference transform_operator.py:76)") {
    assert(runInt(Casts.toIntStrict) === Seq(
      Some(42), Some(42), None, None, None, None,
      None, None, None, None, None, None))
  }

  test("toIntTolerant: blank→null else cast (transform_lease.py:31-36)") {
    assert(runInt(Casts.toIntTolerant) === Seq(
      Some(42), Some(42), Some(-5), None, None, None,
      None, None, None, None, None, None))
  }

  test("toNumZero: blank/null→0.0, unparseable→null (transform_operator.py:78-82)") {
    val got = runDouble(Casts.toNumZero)
    assert(got(0).contains(42.0) && got(1).contains(42.0))
    assert(got(2).contains(-5.0) && got(3).contains(12.0))
    assert(got(4).contains(0.0) && got(5).contains(0.0))
    // "NULL"/"null" are not blank → cast("double") → null
    assert(got(6).isEmpty && got(7).isEmpty)
    // "NaN" parses to Double.NaN under Spark's double cast
    assert(got(8).exists(_.isNaN))
    assert(got(10).isEmpty)
    assert(got(11).contains(0.0)) // SQL null → 0.0
  }

  test("normNull: null-token normalization (dags/pdq_etl_dag.py:149-158)") {
    val got = edge.toDF("v").select(Casts.normNull(col("v")).as("r"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got === Seq(
      Some("42"), Some("42"), Some("-5"), Some("12.0"), None,
      None, None, None, None, None, Some("abc"), None))
  }

  test("yyyymmFromVariants coalesce chain (dags/pdq_etl_dag.py:120-140)") {
    val df = Seq(
      ("202401", null, null, null, null),
      (null, "202402", null, null, null),
      (null, null, "202403", null, null),
      (null, null, null, "2024", "4"),
      (null, null, null, null, null)
    ).toDF("ym", "ymn", "yrmo", "y", "m")
    val got = df.select(Casts.yyyymmFromVariants(
        col("ym"), col("ymn"), col("yrmo"), col("y"), col("m")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    assert(got === Seq(Some(202401), Some(202402), Some(202403), Some(202404), None))
  }

  test("keyDefault: null key → 0 (transform_operator.py:89)") {
    val got = Seq(Some("7"), Some(""), None).toDF("v")
      .select(Casts.keyDefault(col("v")).as("r"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(7, 0, 0))
  }

  test("validMonth floor drops pre-2000 (dags/pdq_etl_dag.py:213)") {
    val got = Seq(199912, 200001, 202401).toDF("m")
      .where(Casts.validMonth(col("m"))).collect().map(_.getInt(0)).toSeq
    assert(got === Seq(200001, 202401))
  }
}
