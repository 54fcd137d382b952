package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Timestamp-flavor parity: every time-typed operator must produce the
  * SAME rows whether its inputs carry TimestampType (LTZ) or
  * TimestampNTZType columns.
  *
  * Why this matters: parquet without timezone metadata reads back as
  * NTZ under Spark 4's inference — the testdata silently flipped flavor
  * between rounds and only the native as-of join noticed (its
  * equal-type invariant threw; r6 defect #1). This spec runs each
  * operator twice, once per flavor, and compares results with time
  * columns normalized to epoch micros — so the next flavor flip fails
  * HERE, not in the driver's correctness gate.
  */
class NtzParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Cast every timestamp-flavored column of `df` to `flavor`. */
  private def withFlavor(df: DataFrame, flavor: String): DataFrame =
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      if (f.dataType.typeName.startsWith("timestamp"))
        col(f.name).cast(flavor).as(f.name)
      else col(f.name)
    }: _*)

  /** Collect with timestamp-ish columns normalized to epoch micros (the
    * two flavors render differently but denote the same instant here —
    * the test session runs in UTC).
    */
  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val norm = df.select(df.schema.fields.toIndexedSeq.map { f =>
      if (f.dataType.typeName.startsWith("timestamp"))
        unix_micros(col(f.name).cast("timestamp")).as(f.name)
      else col(f.name)
    }: _*)
    norm.collect().toSeq.map(_.toSeq)
      .sortBy(_.mkString(""))
  }

  private def assertParity(build: String => DataFrame): Unit = {
    val ltz = canon(build("timestamp"))
    val ntz = canon(build("timestamp_ntz"))
    assert(ltz.nonEmpty, "parity fixture produced no rows")
    assert(ntz === ltz)
  }

  private def events(flavor: String): DataFrame = withFlavor(
    (1 to 120).map { i =>
      (i % 7L, i.toLong * 600L * 1000000L, // 10-min spacing
        Seq("view", "click", "purchase")(i % 3), s"e$i")
    }.toDF("uid", "t", "etype", "eid")
      .select(col("uid"), timestamp_micros(col("t")).as("ts"),
        col("etype"), col("eid")),
    flavor)

  test("sessionize: identical sessions under either flavor") {
    assertParity { flavor =>
      graft.ops.Windows.sessionize(events(flavor), "uid", "ts",
        Seq(col("ts"), col("eid")), gapSeconds = 1500L)
        .select("uid", "eid", "session_id")
    }
  }

  test("composed as-of join: identical matches under either flavor") {
    assertParity { flavor =>
      val snaps = withFlavor(
        (1 to 20).map(j => (j % 7L, j.toLong * 3600L * 1000000L, j * 10))
          .toDF("uid", "t", "snap")
          .select(col("uid"), timestamp_micros(col("t")).as("sts"),
            col("snap")),
        flavor)
      graft.ops.AsOf.asofJoin(events(flavor).drop("etype"), snaps,
        Seq("uid"), "ts", "sts")
        .select("uid", "eid", "snap")
    }
  }

  test("interval join (bucketed AND native): identical under either flavor") {
    def spans(flavor: String) = withFlavor(
      (1 to 15).map { j =>
        (j % 7L, j.toLong * 3000L * 1000000L,
          (j.toLong * 3000L + 4000L) * 1000000L, s"w$j")
      }.toDF("uid", "s", "e", "wid")
        .select(col("uid"), timestamp_micros(col("s")).as("ws"),
          timestamp_micros(col("e")).as("we"), col("wid")),
      flavor)
    assertParity { flavor =>
      graft.ops.RangeJoin.intervalJoin(events(flavor).drop("etype"),
        spans(flavor), Seq("uid"), "ts", "ws", "we", bucketWidth = 1800L)
        .select("uid", "eid", "wid")
    }
    assertParity { flavor =>
      graft.ops.RangeJoin.intervalJoinNative(events(flavor).drop("etype"),
        spans(flavor), Seq("uid"), "ts", "ws", "we")
        .select("uid", "eid", "wid")
    }
  }

  test("funnel step times: identical under either flavor") {
    assertParity { flavor =>
      graft.ops.Funnel.stepTimes(events(flavor), "uid", "ts", "etype",
        Seq("view", "click", "purchase"))
    }
  }

  test("cohort retention: identical under either flavor") {
    assertParity { flavor =>
      graft.ops.Cohorts.retentionDaily(events(flavor), "uid", "ts")
    }
  }

  test("SCD2 init+merge+asOf: identical history under either flavor") {
    assertParity { flavor =>
      def eff(day: String) =
        to_timestamp(lit(s"$day 00:00:00")).cast(flavor)
      val s1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      val s2 = Seq((1L, "a2"), (3L, "c")).toDF("id", "v")
      val h0 = graft.sinks.Scd2.init(s1, eff("2024-01-01"))
      val h1 = graft.sinks.Scd2.mergeSnapshot(h0, s2, Seq("id"), Seq("v"),
        eff("2024-02-01"))
      val atRead = graft.sinks.Scd2.asOf(h1, eff("2024-01-15"))
        .select(col("id"), col("v").as("v_asof"),
          col("valid_from").as("vf_asof"))
      h1.select(col("id"), col("v"), col("valid_from"), col("valid_to"))
        .join(atRead, Seq("id"), "left")
    }
  }
}
