package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Curation, TextStats}
import graft.ops.Casts

/** The harness pins `spark.sql.ansi.enabled=false` (reference
  * semantics), but a LIBRARY must also survive a user session with ANSI
  * on: no runtime throws from casts/arithmetic, and identical results.
  * This spec runs the representative risk surface — tolerant casts
  * (try_cast), hash/pmod arithmetic on negative ids, the winnowing
  * packed keys, the CC closure's decimal fixpoint signature, and the
  * bounded-heap aggregate — under both modes and compares.
  */
class AnsiModeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def underAnsi[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", on.toString)
    try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  private def snap(df: => DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: Array[_] => a.toSeq
      case x => x
    }).toSeq

  private def bothModes(df: => DataFrame): Unit = {
    val off = underAnsi(false)(snap(df))
    val on = underAnsi(true)(snap(df))
    assert(on === off)
  }

  test("tolerant casts: identical under ANSI, no throws on junk input") {
    val junk = Seq("12", " 34 ", "x9", "", "  ", "NULL", "-5", "9.5", "99999999999")
      .toDF("v")
    bothModes(junk.select(
      Casts.toIntTolerant(col("v")).as("a"),
      Casts.toIntStrict(col("v")).as("b"),
      Casts.toNumZero(col("v")).as("c"),
      Casts.keyDefault(col("v")).as("d")))
  }

  test("sample hash and weighted mix survive negative ids under ANSI") {
    val ids = Seq(-999999L, -1L, 0L, 1L, 123456789L).toDF("id")
    bothModes(ids.select(Curation.sampleBucket(col("id"), 42L).as("b")))
  }

  test("winnowing packed keys and token entropy are mode-independent") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha alpha alpha alpha")).toDF("doc_id", "text")
    bothModes(TextStats.winnowFingerprints(docs, "doc_id", "text")
      .orderBy("doc_id", "pos", "fp"))
    bothModes(docs.select(col("doc_id"), TextStats.tokens(col("text")).as("t"))
      .select(col("doc_id"), TextStats.tokenEntropyOf(col("t")).as("e"))
      .orderBy("doc_id"))
  }

  test("alternating CC closure converges under ANSI (decimal signature can't overflow-throw)") {
    val chain = (0L until 31L).map(i => (i, i + 1)).toDF("s", "d")
    val labels = underAnsi(true) {
      graft.ops.ConnectedComponents.componentsAlternating(chain, "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(labels.size === 32 && labels.values.forall(_ === 0L))
  }

  test("quantile sketches and bloom pruning agree across modes") {
    import graft.functions.QuantileSketch._
    val vals = (1 to 500).map(i => (i % 7, i * 1.5)).toDF("g", "v")
    bothModes(vals.groupBy(col("g"))
      .agg(quantileSketch(col("v")).as("sk"))
      .agg(mergeQuantileSketches(col("sk")).as("sk"))
      .select(sketchQuantile(col("sk"), 0.5).as("p50")))
    import graft.ops.BloomPrune
    val probe = (1 to 200).map(i => (i.toLong, i.toString)).toDF("pk", "t")
    val build = (1 to 200 by 20).map(i => (i.toLong, "x")).toDF("bk", "u")
    bothModes(BloomPrune.bloomPrunedJoin(probe, build, "pk", "bk")
      .orderBy("pk"))
  }

  test("bounded-heap top-k and zorder agree across modes") {
    val rows = Seq(("g", "a", 3L), ("g", "b", 9L), ("g", "c", 9L)).toDF("g", "item", "m")
    bothModes(rows.groupBy(col("g"))
      .agg(graft.functions.TopKAgg.topK(col("item"), col("m"), 2).as("top"))
      .select(col("g"), expr("transform(top, e -> e.item)").as("items")))
    val pts = Seq((3L, 5L), (0x7FFFFFFFL, 0L)).toDF("a", "b")
    bothModes(pts.select(graft.functions.ZOrderKey.zorderKey(col("a"), col("b"))))
  }
}
