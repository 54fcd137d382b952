package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Curation
import graft.ops.{Casts, DedupeAgg}
import graft.sinks.Upsert

/** Property-based invariants (SURVEY.md §5): cast semantics vs a model
  * implementation, dedupe-agg mass preservation + PK uniqueness, upsert
  * idempotency.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val messyString: Gen[String] = Gen.oneOf(
    Gen.numStr, Gen.alphaNumStr,
    Gen.oneOf("", " ", "NULL", "null", "NaN", "nan", "-5", "12.0", "+7", " 42 "),
    Gen.chooseNum(-99999, 99999).map(_.toString))

  test("toIntStrict matches the isdigit model on arbitrary strings") {
    check(Prop.forAll(Gen.listOfN(30, messyString)) { xs =>
      val got = xs.toDF("v").select(Casts.toIntStrict(col("v")).as("r"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
      val model = xs.map { s =>
        val t = s.trim
        if (t.nonEmpty && t.forall(_.isDigit) && t.toLongOption.exists(_ <= Int.MaxValue))
          Some(t.toInt)
        else None
      }
      got == model
    })
  }

  test("normNull yields null or a trimmed non-token, never a token") {
    check(Prop.forAll(Gen.listOfN(30, messyString)) { xs =>
      val got = xs.toDF("v").select(Casts.normNull(col("v")).as("r"))
        .collect().map(r => Option(r.getString(0))).toSeq
      got.forall {
        case None => true
        case Some(s) => s == s.trim && !Casts.NullTokens.contains(s)
      }
    })
  }

  test("dedupeAgg preserves total measure mass and leaves keys unique") {
    val rows = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 3), Gen.chooseNum(-100, 100)))
    check(Prop.forAll(rows) { xs =>
      val df = xs.map { case (k, m, v) => (k, m, v.toLong) }.toDF("k", "yyyymm", "v")
      val out = DedupeAgg.dedupeAgg(df, Seq("k", "yyyymm"), Nil, Seq("v"),
        deterministic = true)
      val massIn = xs.map(_._3.toLong).sum
      val massOut = out.agg(sum("v")).collect()(0).getLong(0)
      val unique = out.groupBy("k", "yyyymm").count()
        .where(col("count") > 1).count() == 0L
      massIn == massOut && unique
    })
  }

  test("upsert merge is idempotent and key-unique") {
    val frame = Gen.listOfN(20, Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0, 999)))
    check(Prop.forAll(frame, frame) { (e, i) =>
      // dedupe generated keys so merge inputs satisfy the PK contract
      val ex = e.distinctBy(_._1).toDF("k", "v")
      val in = i.distinctBy(_._1).toDF("k", "v")
      val once = Upsert.merge(ex, in, Seq("k"))
        .orderBy("k").as[(Int, Int)].collect().toSeq
      val twice = Upsert.merge(Upsert.merge(ex, in, Seq("k")), in, Seq("k"))
        .orderBy("k").as[(Int, Int)].collect().toSeq
      once == twice && once.map(_._1).distinct.size == once.size
    })
  }

  test("sampleHash at a smaller fraction is a subset of a larger one (same seed)") {
    val ids = Gen.listOfN(80, Gen.chooseNum(0L, 5000000L))
    val fracs = Gen.zip(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0))
    check(Prop.forAll(ids, fracs) { case (xs, (fa, fb)) =>
      val (lo, hi) = (math.min(fa, fb), math.max(fa, fb))
      val df = xs.distinct.toDF("id")
      def kept(f: Double) = df.where(Curation.sampleHash(col("id"), f))
        .as[Long].collect().toSet
      // the keep decision is a threshold on one hash bucket, so samples
      // are nested: growing the fraction only ever adds rows
      kept(lo).subsetOf(kept(hi))
    })
  }

  test("concatChunkPlan invariants: contiguous offsets, chunk math consistent") {
    val rows = Gen.listOfN(30, Gen.chooseNum(0L, 700L))
    check(Prop.forAll(rows, Gen.chooseNum(1, 1024)) { (ns, budget) =>
      val df = ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "n")
      val out = Curation.concatChunkPlan(df, "id", "n", budget)
        .orderBy("id")
        .select("n", "start_offset", "chunk_id", "offset_in_chunk")
        .as[(Long, Long, Long, Long)].collect().toSeq
      // starts are the exclusive prefix sums, in order
      val starts = ns.scanLeft(0L)(_ + _).init
      out.map(_._2) == starts &&
        // chunk math is internally consistent with the budget
        out.forall { case (_, s, c, o) =>
          c == s / budget && o == s % budget && o < budget
        }
    })
  }
}
