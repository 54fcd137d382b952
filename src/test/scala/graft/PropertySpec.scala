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

  test("TopKAgg equals the sort-take model for arbitrary groups, metrics, and k") {
    import graft.functions.TopKAgg.topK
    val row = for {
      g <- Gen.oneOf("p", "q", "r")
      item <- Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
      m <- Gen.chooseNum(-50L, 50L) // ties are likely by construction
    } yield (g, item, m)
    check(Prop.forAll(Gen.listOfN(60, row), Gen.chooseNum(1, 7)) { (rows, k) =>
      val got = rows.toDF("g", "item", "m").repartition(5)
        .groupBy(col("g")).agg(topK(col("item"), col("m"), k).as("top"))
        .select(col("g"), explode(col("top")).as("e"))
        .select(col("g"), col("e.item"), col("e.metric"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
      // every row counts (duplicates included): rank by (m desc, item
      // asc) and take k — the heap must agree element-for-element
      val model = rows.groupBy(_._1).view.mapValues {
        _.map(t => (t._2, t._3)).sortBy { case (i, m) => (-m, i) }.take(k)
      }.toMap
      model.forall { case (g, want) => got.getOrElse(g, Nil) == want }
    })
  }

  test("Reagg.coarsen equals direct aggregation for arbitrary two-level groupings") {
    import graft.ops.Reagg
    val row = for {
      fine <- Gen.chooseNum(0, 11)
      g <- Gen.oneOf("a", "b")
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (fine, g, v)
    check(Prop.forAll(Gen.listOfN(50, row)) { rows =>
      val df = rows.toDF("fine", "g", "v")
      val pre = df.groupBy(col("fine"), col("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
      val coarse = Reagg.coarsen(pre.withColumn("bucket", col("fine") % 3),
        Seq(col("bucket"), col("g")),
        sums = Seq("n", "sv"), mins = Seq("mn"), maxs = Seq("mx"))
        .collect().map(r => ((r.getInt(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      val direct = df.withColumn("bucket", col("fine") % 3)
        .groupBy(col("bucket"), col("g"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .collect().map(r => ((r.getInt(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      coarse == direct
    })
  }

  test("zorder key is monotone under the interleave model on arbitrary pairs") {
    import graft.functions.ZOrderKey
    val coord = Gen.chooseNum(0L, 0x7FFFFFFFL)
    check(Prop.forAll(Gen.listOfN(25, Gen.zip(coord, coord))) { pts =>
      val got = pts.toDF("a", "b")
        .select(ZOrderKey.zorderKey(col("a"), col("b")).as("z"))
        .collect().map(_.getLong(0)).toSeq
      val model = pts.map { case (a, b) =>
        (0 until 31).map(i =>
          (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
          .reduce(_ | _)
      }
      got == model
    })
  }
}
