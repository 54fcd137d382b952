package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity
import graft.ops.Eval

/** Round-7 ANN extensions: rank-biased overlap, product-quantization
  * ADC, and the JL sign projection.
  */
class AnnEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --------------------------------------------------------------- rbo

  test("rbo of identical rankings is the closed-form truncated mass") {
    val r = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("q", "item", "rank")
    val got = Eval.rbo(r, r, "q", "item", "rank", p = 0.9, k = 3)
      .select("rbo").as[Double].head()
    // X_d = d at every depth: RBO = (1-p)·Σ p^(d-1) = 1 - p^k
    val want = Eval.rboWeightsNano(0.9, 3).sum / 1e9
    assert(math.abs(got - want) < 1e-9)
    assert(math.abs(want - (1 - math.pow(0.9, 3))) < 1e-6)
  }

  test("rbo of disjoint rankings is 0, and queries missing from B still emit") {
    val a = Seq((1L, 10L, 1), (2L, 20L, 1)).toDF("q", "item", "rank")
    val b = Seq((1L, 99L, 1)).toDF("q", "item", "rank")
    val got = Eval.rbo(a, b, "q", "item", "rank", p = 0.9, k = 3)
      .orderBy("query_id")
      .select("query_id", "n_common", "rbo").as[(Long, Long, Double)]
      .collect().toSeq
    assert(got === Seq((1L, 0L, 0.0), (2L, 0L, 0.0)))
  }

  test("rbo weights a top-rank agreement above a tail agreement") {
    // same single common item, at rank 1 vs rank 3 on the B side
    val a = Seq((1L, 10L, 1), (2L, 20L, 1)).toDF("q", "item", "rank")
    val b = Seq((1L, 10L, 1), (2L, 20L, 3)).toDF("q", "item", "rank")
    val got = Eval.rbo(a, b, "q", "item", "rank", p = 0.9, k = 3)
      .orderBy("query_id").select("rbo").as[Double].collect()
    assert(got(0) > got(1) && got(1) > 0.0)
  }

  // ---------------------------------------------------------------- pq

  test("knnPqAdc is exact when the corpus lies on the codebook grid") {
    // 4 vectors over m=2 subspaces of 2 dims; init-only training (iters=0)
    // makes the codebooks the first-2 vectors' subvectors, and every
    // corpus subvector appears in the codebook → reconstruction is
    // exact → approx_sim must equal the true cosine on every pair.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 1f)), (1L, Array(0f, 1f, 1f, 0f)),
      (2L, Array(1f, 0f, 1f, 0f)), (3L, Array(0f, 1f, 0f, 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooksCached("test-pq-grid", df, "vec_id",
      "embedding", dims = 4, m = 2, k = 2, iters = 0)
    assert(books.length === 2 && books.forall(_.length === 2))
    val out = Similarity.knnPqAdc(df, df, "vec_id", "vec_id", "embedding",
        books, k = 3)
      .select("approx_sim", "true_sim").as[(Double, Double)].collect()
    assert(out.nonEmpty && out.forall { case (a, t) => a === t })
  }

  test("knnPqRefined recovers the true order ADC quantization loses") {
    // m=1, k=2, iters=0 → the codebook is the first two vectors, so
    // (0.8,0.2) and (0.9,0.1) BOTH encode to centroid (1,0): identical
    // codes, identical approx_sim. Plain ADC ranking must then fall to
    // the neighbor_id tie-break and put vec 2 above the truly-closer
    // vec 3 — the quantization-loss case refine exists for. The refined
    // ranking re-orders the shortlist by exact cosine and recovers it.
    val corpus = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
      (2L, Array(0.8f, 0.2f)), (3L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooksCached("test-pq-refine", corpus,
      "vec_id", "embedding", dims = 2, m = 1, k = 2, iters = 0)
    def top2(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    val plain = top2(Similarity.knnPqAdc(q, corpus, "vec_id", "vec_id",
      "embedding", books, k = 2))
    val refined = top2(Similarity.knnPqRefined(q, corpus, "vec_id",
      "vec_id", "embedding", books, k = 2, refine = 2))
    assert(plain === Seq(0L, 2L),
      "ADC ties must fall to the id tie-break (the loss being tested)")
    assert(refined === Seq(0L, 3L),
      "refine must re-rank the shortlist by exact cosine")
    // contract shape: true_sim is non-increasing down the refined ranks
    val sims = Similarity.knnPqRefined(q, corpus, "vec_id", "vec_id",
        "embedding", books, k = 4, refine = 1)
      .orderBy("rank").select("true_sim").as[Double].collect()
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("knnSq8 codes are 0..255 and an identical vector ranks top-1") {
    val rnd = new scala.util.Random(3)
    val dims = 8
    def v() = Array.fill(dims)((rnd.nextDouble() * 2 - 1).toFloat)
    val shared = v()
    val corpus = ((1L to 30L).map(id => (id, v())) :+ (98L, shared) :+
      (99L, shared)).toDF("vec_id", "embedding")
    val got = Similarity.knnSq8(
      corpus.where(col("vec_id") === 99L), corpus,
      "vec_id", "vec_id", "embedding", dims = dims, k = 5)
      .orderBy("rank").collect()
    // 98 reconstructs to the query's own codes — approx cosine exactly 1
    assert(got.head.getLong(2) === 98L)
    assert(got.head.getDouble(3) === 1.0)
    assert(got.head.getDouble(4) === 1.0)
    // approx score is monotone non-increasing down the ranking
    val sims = got.map(_.getDouble(3)).toSeq
    assert(sims === sims.sortBy(-_))
  }

  test("knnSq8 reruns bit-identically (no trained state)") {
    val rnd = new scala.util.Random(17)
    val corpus = (1L to 40L)
      .map(id => (id, Array.fill(8)((rnd.nextDouble() - 0.5).toFloat)))
      .toDF("vec_id", "embedding")
    def run() = Similarity.knnSq8(corpus.where(col("vec_id") < 3L), corpus,
        "vec_id", "vec_id", "embedding", dims = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(run() === run())
  }

  test("pq codebooks memoize per subspace tag") {
    val df = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val b1 = Similarity.pqCodebooksCached("test-pq-memo", df, "vec_id",
      "embedding", dims = 2, m = 1, k = 2, iters = 0)
    val b2 = Similarity.trainedCodebooks("test-pq-memo", m = 1)
    assert(b2.isDefined && (b2.get(0) eq b1(0)))
  }

  // ------------------------------------------------------- separability

  test("labelScatter is zero for identical vectors, positive otherwise") {
    val df = Seq(
      (0, Array(1f, 2f)), (0, Array(1f, 2f)), (0, Array(1f, 2f)),
      (1, Array(1f, 0f)), (1, Array(0f, 1f))).toDF("label", "embedding")
    val got = graft.llm.Separability.labelScatter(df, "label", "embedding")
      .select("label", "n_rows", "within_n2")
      .as[(Int, Long, Long)].collect()
      .map { case (l, n, w) => l -> ((n, w)) }.toMap
    assert(got(0) === ((3L, 0L)))  // coincident points: exact zero scatter
    // label 1: n·Σ‖e‖² − ‖Σe‖² = 2·(1e8 + 1e8) − 2·1e8 = 2e8 on the 1e4 grid
    assert(got(1) === ((2L, 200000000L)))
  }

  // ------------------------------------------------------------ phrase

  test("phraseMatch counts overlapping occurrences and respects boundaries") {
    val docs = Seq(
      (1L, "a a a b"),      // "a a" occurs at 0 and 1 (overlap)
      (2L, "b a a"),        // once, at the end boundary
      (3L, "a b a"),        // never consecutive
      (4L, "x y z")).toDF("doc_id", "text")
    val got = graft.llm.Retrieval.phraseMatch(docs, "doc_id", "text",
        Seq("a", "a"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 1L)))
  }

  test("phraseMatch chains three distinct terms in order") {
    val docs = Seq((1L, "fast value table part end"),
      (2L, "part table value")).toDF("doc_id", "text")
    val got = graft.llm.Retrieval.phraseMatch(docs, "doc_id", "text",
        Seq("value", "table", "part"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L)))
  }

  // ---------------------------------------------------------------- jl

  test("jlSignRows is deterministic, ±1-valued, and decorrelated") {
    val a = Similarity.jlSignRows(64, 32)
    val b = Similarity.jlSignRows(64, 32)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(x => x == 1.0 || x == -1.0))
    // pairwise row dot products concentrate near 0 (|dot| ≤ 32 of 64):
    // the linear-mix bug this guards against produced fully correlated
    // rows (|dot| = 64)
    val maxAbsDot = (for {
      i <- a.indices; j <- a.indices if i < j
    } yield math.abs(a(i).zip(a(j)).map { case (x, y) => x * y }.sum)).max
    assert(maxAbsDot <= 32.0)
  }

  test("projectSigned matches the Scala-side fold") {
    val signs = Similarity.jlSignRows(4, 2)
    val v = Array(1.5f, -2.0f, 0.5f, 3.0f)
    val got = Seq((0L, v)).toDF("id", "vec")
      .select(Similarity.projectSigned(col("vec"), signs).as("p"))
      .as[Seq[Double]].head()
    val want = signs.map(row =>
      row.zip(v).foldLeft(0.0) { case (acc, (r, x)) => acc + r * x.toDouble })
    assert(got === want.toSeq)
  }

  // --------------------------------------------------------------- mmr

  /** In-memory MMR reference with the operator's exact contract:
    * sequential-fold double cosine, HALF_UP 6-rounding before every
    * comparison, (score desc, id asc) argmax per round.
    */
  private def refMmr(queries: Seq[(Long, Array[Float])],
                     corpus: Seq[(Long, Array[Float])], poolK: Int,
                     selectK: Int, lambda: Double, mu: Double)
    : Seq[(Long, Int, Long, Double)] = {
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0
      a.indices.foreach { i =>
        dab += a(i).toDouble * b(i).toDouble
        daa += a(i).toDouble * a(i).toDouble
        dbb += b(i).toDouble * b(i).toDouble
      }
      val d = math.sqrt(daa) * math.sqrt(dbb)
      if (d > 0) dab / d else 0.0
    }
    queries.flatMap { case (qid, qv) =>
      var pool = corpus.filter(_._1 != qid)
        .map { case (id, v) => (id, v, r6(cos(qv, v)), 0.0) }
        .sortBy { case (id, _, rel, _) => (-rel, id) }
        .take(poolK)
      (1 to selectK).map { t =>
        val pick = pool
          .map { case (id, v, rel, ms) =>
            (id, v, rel, ms, r6(lambda * rel - mu * ms)) }
          .sortBy { case (id, _, _, _, sc) => (-sc, id) }.head
        pool = pool.filter(_._1 != pick._1).map { case (id, v, rel, ms) =>
          (id, v, rel, math.max(ms, r6(cos(v, pick._2))))
        }
        (qid, t, pick._1, pick._5)
      }
    }
  }

  private def mmrFixture: Seq[(Long, Array[Float])] = {
    // a deterministic LCG cloud in 4 dims, plus planted near-dup pairs
    var s = 4242L
    def next() = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % 1000).toInt / 500.0f - 1.0f }
    val cloud = (10L until 40L).map(i =>
      (i, Array.fill(4)(next())))
    val dups = Seq(
      (50L, Array(0.99f, 0.10f, 0f, 0f)), (51L, Array(0.98f, 0.12f, 0f, 0f)),
      (52L, Array(0.97f, 0.14f, 0f, 0f)))
    (0L, Array(1f, 0f, 0f, 0f)) +: (cloud ++ dups)
  }

  test("mmrRerank matches the in-memory reference on a mixed cloud") {
    val df = mmrFixture.toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df.where(col("vec_id") < 1), df,
        "vec_id", "vec_id", "embedding", poolK = 12, selectK = 6,
        lambda = 0.7, mu = 0.3)
      .orderBy("query_id", "mmr_rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val want = refMmr(mmrFixture.filter(_._1 < 1), mmrFixture,
      poolK = 12, selectK = 6, lambda = 0.7, mu = 0.3)
    assert(got === want)
  }

  test("mmr first pick is argmax relevance; a diversity-weighted second pick skips the near-dup") {
    // query along e1; two near-identical high-relevance vectors and one
    // diverse moderate-relevance vector: top-2 by cosine takes both
    // near-dups, MMR with a diversity-heavy (λ=0.3, μ=0.7) weighting
    // must take the diverse one second
    val corpus = Seq(
      (1L, Array(0.99f, 0.10f, 0f, 0f)), (2L, Array(0.98f, 0.12f, 0f, 0f)),
      (3L, Array(0.80f, 0.60f, 0f, 0f)))
    val df = ((0L, Array(1f, 0f, 0f, 0f)) +: corpus).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df.where(col("vec_id") === 0), df,
        "vec_id", "vec_id", "embedding", poolK = 3, selectK = 2,
        lambda = 0.3, mu = 0.7)
      .orderBy("mmr_rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L))
    // and the pure-relevance top-2 WOULD have taken the near-dup
    val brute = Similarity.knnBrute(df.where(col("vec_id") === 0), df,
        "vec_id", "vec_id", "embedding", k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(brute === Seq(1L, 2L))
  }

  test("mmr rejects a pool smaller than the selection budget") {
    val df = mmrFixture.toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(df, df, "vec_id", "vec_id", "embedding",
        poolK = 5, selectK = 6)
    }
    assert(e.getMessage.contains("poolK"))
  }
}
