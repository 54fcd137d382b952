package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm._

/** LLM-pipeline operators: dedup (exact/minhash/simhash/jaccard),
  * similarity search, text stats, multimodal plumbing.
  */
class LlmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again today"
  private val docA2 = "the quick brown fox jumps over the lazy dog again and again tomorrow" // near-dup of A
  private val docB = "completely different content about spark shuffles and partitions at scale"
  private val docs = Seq((0L, docA), (1L, docA2), (2L, docB), (3L, docA))
    .toDF("doc_id", "text")

  test("exact dedup: fingerprint groups and deterministic survivor") {
    val groups = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(groups.length === 1)
    assert(groups(0).getLong(1) === 2L && groups(0).getLong(2) === 0L) // docs 0,3; keep 0
    val kept = Dedup.dropExactDups(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(0L, 1L, 2L))
  }

  test("minhash LSH: near-dup pair found, unrelated pair not") {
    val pairs = MinHash.dupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b", "n_matching_sigs").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // exact dup (0,3): all 8 sigs match
    assert(pairs(((0L, 3L))) === 8L)
    // near-dup (0,1) and (1,3): found with most sigs matching
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) >= 4L)
    // unrelated docB never pairs
    assert(!pairs.keys.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("connected components: chains converge to min label, singleton edges isolate") {
    import graft.ops.ConnectedComponents
    // a 10-node chain (worst diameter), a separate pair, a triangle
    val chain = (0L until 9L).map(i => (i, i + 1))
    val edges = (chain ++ Seq((100L, 101L), (200L, 201L), (201L, 202L), (200L, 202L)))
      .toDF("s", "d")
    val got = ConnectedComponents.components(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 9L).foreach(i => assert(got(i) === 0L, s"node $i"))
    assert(got(100L) === 100L && got(101L) === 100L)
    assert(Seq(200L, 201L, 202L).forall(got(_) === 200L))
    assert(got.size === 15) // only nodes that appear in edges
  }

  test("alternating components: matches min-label propagation, converges on deep chains") {
    import graft.ops.ConnectedComponents
    // parity on a mixed graph: chain, isolated pair, triangle
    val edges = ((0L until 9L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (200L, 201L), (201L, 202L), (200L, 202L))).toDF("s", "d")
    val viaLabel = ConnectedComponents.components(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = ConnectedComponents.componentsAlternating(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar === viaLabel)

    // a 64-node chain: diameter 63 exceeds min-label's default budget,
    // but the star alternation needs only ~log^2 rounds
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("s", "d")
    intercept[IllegalStateException] {
      ConnectedComponents.components(chain, "s", "d", maxIter = 20).collect()
    }
    val got = ConnectedComponents.componentsAlternating(chain, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 64 && got.values.forall(_ === 0L))

    // parity on a deterministic pseudo-random multigraph (dup edges, any
    // orientation, self-loops)
    val rand = ((0 until 300).map(i => ((i * 7919L + 13) % 97, (i * 104729L + 7) % 97)) ++
      Seq((5L, 5L))).toDF("s", "d")
    val a = ConnectedComponents.components(rand, "s", "d", maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ConnectedComponents.componentsAlternating(rand, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b === a)
  }

  test("components: superseded checkpoint generations are released each round") {
    import graft.ops.ConnectedComponents
    val sc = spark.sparkContext
    // deep chain + triangle: several rounds for BOTH closures, so an
    // unreleased generation per round would show up as unbounded growth
    val edges = ((0L until 20L).map(i => (i, i + 1)) ++
      Seq((200L, 201L), (201L, 202L), (200L, 202L))).toDF("s", "d")

    def persistedGrowth(run: => Unit): Int = {
      val before = sc.getPersistentRDDs.keySet
      run
      (sc.getPersistentRDDs.keySet -- before).size
    }

    // min-label: survivors = the returned labels' final checkpoint only
    // (the symmetrized edge set is released after its last join)
    val gLabel = persistedGrowth {
      ConnectedComponents.components(edges, "s", "d", maxIter = 30).count()
    }
    assert(gLabel <= 2, s"min-label left $gLabel checkpoint RDDs pinned " +
      "(superseded label generations must be unpersisted)")

    // alternating: survivors = the node set + the final star forest the
    // result reads; every superseded edge generation must be gone
    val gStar = persistedGrowth {
      ConnectedComponents.componentsAlternating(edges, "s", "d").count()
    }
    assert(gStar <= 3, s"alternating left $gStar checkpoint RDDs pinned " +
      "(superseded edge generations must be unpersisted)")
  }

  test("alternating components: fixpoint probe costs one query action per round") {
    import graft.ops.ConnectedComponents
    // Count query ACTIONS (not Spark jobs — AQE splits one query into a
    // job per shuffle stage, so job counts say nothing about probe cost).
    // 64-node chain: diameter 63, alternating closure converges in ~6
    // rounds. Per round = 1 eager checkpoint + 1 signature head; setup =
    // 2 checkpoints + 1 signature; result evaluation = 1 ⇒ 4 + 2R ≈ 16.
    // The superseded triple probe (count + count + except·count) cost 2
    // extra actions per round (4 + 4R ≈ 28) — the bound fails if it
    // comes back.
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    val ql = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = actions.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("s", "d")
    spark.listenerManager.register(ql)
    val n =
      try {
        ConnectedComponents.componentsAlternating(chain, "s", "d").count()
        // the listener bus is async: poll until the counter stops moving
        var last = -1
        var spins = 0
        while (actions.get() != last && spins < 50) {
          last = actions.get(); Thread.sleep(100); spins += 1
        }
        actions.get()
      } finally spark.listenerManager.unregister(ql)
    assert(n > 0 && n <= 20,
      s"componentsAlternating ran $n query actions on a 64-chain; the " +
        "one-aggregate signature probe should keep this at 2 per " +
        "alternation plus setup")
  }

  test("connected components: exhausting maxIter before the fixpoint throws") {
    import graft.ops.ConnectedComponents
    // a 10-node chain needs several min-label rounds; maxIter=1 cannot
    // converge and must NOT silently return half-propagated labels
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("s", "d")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.components(edges, "s", "d", maxIter = 1).collect()
    }
    assert(ex.getMessage.contains("maxIter"))
  }

  test("dropNearDups removes the higher id of each near-dup pair, keeps the rest") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
      (3L, "completely different content about spark physical plans")
    ).toDF("doc_id", "text")
    val kept = graft.llm.Dedup.dropNearDups(docs, "doc_id", "text",
        minEstJaccard = 0.4)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 3L))
  }

  test("simhash: identical texts equal, near-dups close, unrelated far") {
    val sh = docs.select(col("doc_id"),
        SimHash.simhash32(TextStats.tokens(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) === sh(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
    assert(ham(sh(0L), sh(1L)) <= 6)
  }

  test("simhash near pairs: banded candidates find exact dups, honor the verify gate") {
    // doc 0 ≡ doc 3 (hamming 0 → always a pair); unrelated docs only
    // pair if they genuinely verify ≤ 3 bits apart
    val pairs = SimHash.nearPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucket = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs(((0L, 3L))) === 0)
    // every emitted pair satisfies the exact popcount gate (re-check
    // against independently computed fingerprints)
    val sh = docs.select(col("doc_id"),
        SimHash.simhash32(TextStats.tokens(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case ((a, b), h) =>
      assert(java.lang.Long.bitCount(sh(a) ^ sh(b)) === h && h <= 3)
    }
    // the bucket cap excludes saturated bands: with maxBucket = 2 and
    // 2+ identical docs per band bucket the dup pair must survive via
    // its (size-2) buckets
    val capped = SimHash.nearPairs(docs, "doc_id", "text",
        maxHamming = 3, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((0L, 3L)) || capped.isEmpty)
  }

  test("ngram jaccard: identity 1.0, near-dup high, unrelated 0") {
    val j = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Jaccard.ngramJaccard(col("a.text"), col("b.text")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 3L)) === 1.0)
    assert(j((0L, 1L)) > 0.5 && j((0L, 1L)) < 1.0)
    assert(j((0L, 2L)) === 0.0)
  }

  test("knn cosine: self-similar vectors rank first, bucketed ≡ brute within bucket") {
    // 4-dim toy vectors: v1 ≈ v0, v2 orthogonal, v3 = -v0
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0),
      (3L, Array(-1f, 0f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val knn = Similarity.knnBrute(emb.where($"vec_id" === 0), emb,
        "vec_id", "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(knn.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
    assert(knn(0).getDouble(3) > 0.99)
    assert(knn(2).getDouble(3) === -1.0)
    val bucketed = Similarity.knnBucketed(emb.where($"vec_id" === 0), emb,
        "vec_id", "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect()
    // label-0 bucket only: the -v0 vector (label 1) is pruned
    assert(bucketed.map(_.getLong(2)).toSeq === Seq(1L, 2L))
  }

  test("multi-probe LSH: recall@k improves on single-probe, never invents neighbors") {
    // deterministic pseudo-random 64-dim corpus (high-dim so the 4-bit
    // sign bucket is only WEAKLY informative about cosine rank — in low
    // dimensions bucket-mates are exactly the nearest neighbors and every
    // probe strategy scores recall 1.0): 400 vectors, 20 queries
    def vec(seed: Long): Array[Float] =
      (0 until 64).map { d =>
        val h = ((seed * 64 + d) * 2862933555777941757L + 1442695040888963407L)
        ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }.toArray
    val corpus = (0L until 400L).map(i => (i, vec(i))).toDF("id", "embedding")
    val queries = corpus.where($"id" % 20 === 0)
      .select($"id".as("qid"), $"embedding")

    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val k = 10
    val brute = hits(Similarity.knnBrute(queries, corpus, "qid", "id", "embedding", k))
    val emb = corpus.withColumn("bucket", Similarity.signBucket($"embedding", 4))
    val single = hits(Similarity.knnBucketed(
      emb.where($"id" % 20 === 0).select($"id".as("qid"), $"embedding", $"bucket"),
      emb, "qid", "id", "embedding", "bucket", k))
    val multi = hits(Similarity.knnMultiProbe(queries, corpus, "qid", "id",
      "embedding", k, bits = 4, nProbes = 3))

    // every LSH result is a real vector pair from a probed bucket — the
    // approximation can only MISS neighbors, not invent similarities, so
    // per-query result sets are subsets of the brute top-k only when the
    // candidate pool covers them; what we can always assert is recall
    val recallSingle = (single & brute).size.toDouble / brute.size
    val recallMulti = (multi & brute).size.toDouble / brute.size
    info(f"recall@$k single-probe=$recallSingle%.3f multi-probe(3)=$recallMulti%.3f")
    assert(recallMulti >= recallSingle,
      f"multi-probe recall $recallMulti%.3f fell below single-probe $recallSingle%.3f")
    assert(recallMulti > recallSingle + 0.02,
      "3 probes over 16 buckets should strictly beat 1 probe on this fixture")
    // sanity floor so the fixture stays meaningful if regenerated
    assert(recallSingle > 0.02 && recallMulti < 1.0)
  }

  test("IVF k-means: recovers planted clusters; probing more centroids lifts recall") {
    // 3 planted clusters in 16 dims: cluster base vectors far apart,
    // members jittered deterministically around them
    def base(c: Int): Array[Float] =
      (0 until 16).map(d => if (d % 3 == c) 1.0f else 0.05f).toArray
    def member(c: Int, j: Int): Array[Float] =
      base(c).zipWithIndex.map { case (x, d) =>
        x + (((j * 31 + d * 7) % 11) - 5) * 0.02f
      }
    val rows = for (c <- 0 until 3; j <- 0 until 40)
      yield ((c * 40 + j).toLong, c, member(c, j))
    val corpus = rows.toDF("id", "true_cluster", "embedding")

    val cents = Similarity.kMeansCentroids(corpus, "id", "embedding",
      k = 3, iters = 5)
    assert(cents.length === 3 && cents.forall(_.length === 16))

    // cluster recovery: every member lands with its plant-mates (the
    // learned bucket ids may permute, so check partition equality)
    val assigned = corpus
      .withColumn("bucket", Similarity.nearestCentroid(col("embedding"), cents))
      .select("true_cluster", "bucket").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val purity = assigned.groupBy(_._1).values.map { grp =>
      grp.groupBy(_._2).values.map(_.size).max.toDouble / grp.size
    }.min
    assert(purity === 1.0, s"k-means failed to separate planted clusters")

    // IVF recall vs brute: single-probe finds within-cluster neighbors;
    // more probes can only add candidates (monotone recall)
    val queries = corpus.where($"id" % 17 === 0)
      .select($"id".as("qid"), $"embedding")
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = hits(Similarity.knnBrute(queries, corpus, "qid", "id", "embedding", 5))
    val ivf1 = hits(Similarity.knnIvf(queries, corpus, "qid", "id", "embedding",
      cents, k = 5, nProbes = 1))
    val ivf3 = hits(Similarity.knnIvf(queries, corpus, "qid", "id", "embedding",
      cents, k = 5, nProbes = 3))
    val r1 = (ivf1 & brute).size.toDouble / brute.size
    val r3 = (ivf3 & brute).size.toDouble / brute.size
    info(f"IVF recall@5: nProbes=1 $r1%.3f, nProbes=3 $r3%.3f")
    // tight clusters: top-5 neighbors share the query's cluster → bucket
    assert(r1 > 0.9, f"single-probe IVF recall $r1%.3f")
    assert(r3 >= r1)
    assert(r3 === 1.0, "probing every centroid is exhaustive search")
  }

  test("IVF-PQ: full-probe equals PQ-refined exactly; routed probes keep recall on planted clusters") {
    // same planted-cluster fixture as the IVF test: 3 tight clusters,
    // 16 dims, deterministic jitter
    def base(c: Int): Array[Float] =
      (0 until 16).map(d => if (d % 3 == c) 1.0f else 0.05f).toArray
    def member(c: Int, j: Int): Array[Float] =
      base(c).zipWithIndex.map { case (x, d) =>
        x + (((j * 31 + d * 7) % 11) - 5) * 0.02f
      }
    val rows = for (c <- 0 until 3; j <- 0 until 40)
      yield ((c * 40 + j).toLong, member(c, j))
    val corpus = rows.toDF("id", "embedding")
    val queries = corpus.where($"id" % 17 === 0)
      .select($"id".as("qid"), $"embedding")

    val cents = Similarity.kMeansCentroids(corpus, "id", "embedding",
      k = 3, iters = 5)
    val books = Similarity.pqCodebooksCached("llmspec-ivfpq", corpus,
      "id", "embedding", dims = 16, m = 4, k = 4, iters = 3)

    // nProbes = nlist means every bucket is a candidate source — the
    // routing is a no-op and IVF-PQ must reproduce PQ-refined ROW FOR ROW
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val full = rowsOf(Similarity.knnIvfPq(queries, corpus, "qid", "id",
      "embedding", cents, books, k = 5, nProbes = 3, refine = 2))
    val pqr = rowsOf(Similarity.knnPqRefined(queries, corpus, "qid", "id",
      "embedding", books, k = 5, refine = 2))
    assert(full === pqr, "full-probe IVF-PQ diverged from PQ-refined")

    // routed probes: tight planted clusters keep within-cluster
    // neighbors reachable through the query's own bucket
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = hits(Similarity.knnBrute(queries, corpus, "qid", "id",
      "embedding", 5))
    // a 4×4-code quantizer is deliberately coarse — recall comes from
    // the refine width, and probing more buckets can only add candidates
    val routed = hits(Similarity.knnIvfPq(queries, corpus, "qid", "id",
      "embedding", cents, books, k = 5, nProbes = 1, refine = 4))
    val all = hits(Similarity.knnIvfPq(queries, corpus, "qid", "id",
      "embedding", cents, books, k = 5, nProbes = 3, refine = 4))
    val recall = (routed & brute).size.toDouble / brute.size
    val recallAll = (all & brute).size.toDouble / brute.size
    info(f"IVF-PQ recall@5 vs brute: nProbes=1 $recall%.3f, nProbes=3 $recallAll%.3f")
    assert(recall > 0.6, f"routed IVF-PQ recall $recall%.3f")
    assert(recallAll >= recall, "probing every bucket must not lose recall")

    // contract: exact rank is (true_sim desc, neighbor_id) within query
    val out = Similarity.knnIvfPq(queries, corpus, "qid", "id",
      "embedding", cents, books, k = 5, nProbes = 2, refine = 2)
      .orderBy("query_id", "rank").collect()
    out.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getInt(1))
      val ts = byRank.map(r => (r.getDouble(4), r.getLong(2)))
      assert(ts === ts.sortBy { case (t, n) => (-t, n) },
        "exact rank must order by (true_sim desc, neighbor_id)")
    }
  }

  test("embedding near-dups: threshold keeps only the twin pair") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding", "label", 0.9)
      .collect()
    assert(pairs.length === 1)
    assert(pairs(0).getLong(0) === 0L && pairs(0).getLong(1) === 1L)
  }

  test("embedding near-dups: bucket-size cap bounds the hot bucket, leaves small buckets exact") {
    // hot bucket: 40 near-identical vectors under one label; cold bucket:
    // a twin pair that must survive untouched
    val hot = (0L until 40L).map(i => (i, Array(1f, i.toFloat * 1e-4f, 0f, 0f), 0))
    val cold = Seq((100L, Array(0f, 1f, 0f, 0f), 1), (101L, Array(0f, 0.99f, 0.01f, 0f), 1))
    val emb = (hot ++ cold).toDF("vec_id", "embedding", "label")

    val exact = Dedup.embeddingNearDups(emb, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.embeddingNearDups(emb, "vec_id", "embedding", "label", 0.9,
        maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // capped output is a subset: only candidate generation is restricted
    assert(capped.subsetOf(exact))
    // the hot bucket really was split (C(40,2)=780 pairs exact; 4 sub-
    // buckets of ~10 leave at most ~C(13,2)*4 — far fewer)
    assert(exact.size === 780 + 1)
    assert(capped.size < 400 && capped.size > 10)
    // the small bucket's pair is untouched by the cap
    assert(capped.contains((100L, 101L)))
    // a cap larger than every bucket changes nothing
    val bigCap = Dedup.embeddingNearDups(emb, "vec_id", "embedding", "label", 0.9,
        maxBucketSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bigCap === exact)
    // the DEFAULT is the skew-bounded path (finite cap), and an explicit
    // uncapped call agrees with it on buckets under the cap
    assert(Dedup.DefaultMaxBucketSize > 0 &&
      Dedup.DefaultMaxBucketSize < Int.MaxValue)
    val uncapped = Dedup.embeddingNearDups(emb, "vec_id", "embedding", "label", 0.9,
        maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped === exact)
  }

  test("heavy hitters: exact at full capacity, MG bounds under pressure, merges compose") {
    import graft.functions.HeavyHittersAgg.heavyHitters
    // skewed stream: a=500, b=200, c=100, 50 tail items ×10 (N=1300,
    // 53 distinct); repartition(7) forces real partial-aggregate merges
    val rows = Seq.fill(500)("a") ++ Seq.fill(200)("b") ++ Seq.fill(100)("c") ++
      (0 until 50).flatMap(i => Seq.fill(10)(f"tail$i%02d"))
    val df = rows.toDF("item").repartition(7)
    val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap

    def summarize(capacity: Int): Seq[(String, Long)] =
      df.agg(heavyHitters(col("item"), capacity).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est_count"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    // capacity ≥ distinct: EXACT (no decrement can ever fire)
    val exact = summarize(64).toMap
    assert(exact === trueCounts)

    // capacity 8 under pressure: every estimate obeys
    // true - N/(cap+1) ≤ est ≤ true, and the dominant item is present
    val n = rows.size.toLong
    val cap = 8
    val small = summarize(cap)
    val maxErr = n / (cap + 1)
    small.foreach { case (item, est) =>
      val t = trueCounts(item)
      assert(est <= t, s"$item overcounted: $est > $t")
      assert(est >= t - maxErr, s"$item est $est below $t - $maxErr")
    }
    assert(small.head._1 === "a", s"dominant item missing from ${small.take(3)}")
    // output order is the deterministic (est desc, item asc) total order
    assert(small === small.sortBy { case (i, c) => (-c, i) })
  }

  test("dropNearDupsExact: one survivor per cluster, singletons untouched") {
    val near = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, near), (2L, near + " x"), (3L, near + " y"),   // one cluster
      (7L, "completely different text about catalyst plans and shuffles"),
      (9L, "another standalone document with its own unique content here")
    ).toDF("doc_id", "text")
    val survivors = Dedup.dropNearDupsExact(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // cluster {1,2,3} keeps its minimum; singletons stay
    assert(survivors === Set(1L, 7L, 9L))
    // consistency with the cluster labeling itself
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (docs.select("doc_id").collect().map(_.getLong(0)).toSet
      -- clusters.filter { case (d, c) => d != c }.keySet)
    assert(survivors === expected)
  }

  test("winnowDupPairs: local-overlap pairs; boilerplate fingerprint cap") {
    val span = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa" // 16 shared tokens
    val boiler = "standard license header applies to this work in all forms always"
    val docs = (Seq(
      (1L, s"unique one intro $span unique one outro closing words here"),
      (2L, s"different two start $span different two ending text here"),
      (3L, "completely unrelated document about query engines and shuffles")) ++
      // 5 docs sharing ONLY the boilerplate span, distinct filler
      (10L to 14L).map(i => (i, s"filler${i}a filler${i}b filler${i}c $boiler " +
        s"tail${i}x tail${i}y tail${i}z"))).toDF("doc_id", "text")
    def pairs(cap: Int) =
      Dedup.winnowDupPairs(docs, "doc_id", "text", k = 3, w = 4,
          minShared = 2, maxDocsPerFp = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val open = pairs(100)
    assert(open.contains((1L, 2L)))   // the shared span pairs them
    assert(!open.exists(p => p._1 == 3L || p._2 == 3L))
    // all C(5,2) boilerplate pairs present when the cap is open...
    val boilerPairs = (for (a <- 10L to 14L; b <- 10L to 14L if a < b)
      yield (a, b)).toSet
    assert(boilerPairs.subsetOf(open))
    // ...and gone when the cap drops below the 5-doc fingerprint lists
    // (every fp shared among these docs comes from the span itself)
    val capped = pairs(3)
    assert(capped.intersect(boilerPairs).isEmpty)
    assert(capped.contains((1L, 2L))) // 2-doc fingerprints unaffected
  }

  test("winnowDupClusters: transitive grouping across DIFFERENT shared spans") {
    val spanA = (1 to 16).map(j => s"aa$j").mkString(" ")
    val spanB = (1 to 16).map(j => s"bb$j").mkString(" ")
    // 1 and 2 share span A; 2 and 3 share span B; 1 and 3 share NOTHING —
    // pairwise matching keeps them apart, the closure groups all three
    val docs = Seq(
      (1L, s"one intro $spanA one outro ending"),
      (2L, s"two start $spanA middle words $spanB two finish"),
      (3L, s"three lead $spanB three tail closing"),
      (4L, "unrelated content about physical plans and exchanges")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 3L)))
    val clusters = Dedup.winnowDupClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // one cluster
  }

  test("winnow shared materialization: one (doc,fp) build feeds pairs AND clusters") {
    val spanA = (1 to 16).map(j => s"ca$j").mkString(" ")
    val spanB = (1 to 16).map(j => s"cb$j").mkString(" ")
    val docs = Seq(
      (1L, s"one intro $spanA one outro ending"),
      (2L, s"two start $spanA middle words $spanB two finish"),
      (3L, s"three lead $spanB three tail closing"),
      (4L, "unrelated content about physical plans and exchanges")
    ).toDF("doc_id", "text")
    // the expensive tokenize→k-gram→window-min stage runs HERE, once
    val fps = Dedup.winnowFingerprintTable(docs, "doc_id", "text", 3, 4)
    val pairs = Dedup.winnowDupPairsFromFps(fps)
    val clusters = Dedup.winnowDupClustersFromFps(fps)
    // both consumers read the checkpointed longs: every leaf of their
    // plans is the materialized RDD scan — the text source (and with it
    // the tokenize/hash pipeline) appears in NEITHER plan
    def leafClasses(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collectLeaves().map(_.getClass.getSimpleName)
    assert(leafClasses(pairs).forall(_ == "LogicalRDD"),
      s"pairs plan re-reads a non-checkpoint source: ${leafClasses(pairs)}")
    assert(leafClasses(clusters).forall(_ == "LogicalRDD"),
      s"clusters plan re-reads a non-checkpoint source: ${leafClasses(clusters)}")
    // and the shared-build results are the same as the one-shot APIs
    val directPairs = Dedup.winnowDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet === directPairs)
    val directClusters = Dedup.winnowDupClusters(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === directClusters)
  }

  test("top-k agg: parity with the window form, ties, nulls, merges") {
    import graft.functions.TopKAgg.topK
    import org.apache.spark.sql.expressions.Window
    // 3 groups × 40 items with deliberate metric ties at the k boundary;
    // repartition(7) forces real partial-heap merges through the shuffle
    val rows = for (g <- Seq("x", "y", "z"); i <- 0 until 40)
      yield (g, f"item$i%02d", ((i * 7) % 10).toLong)
    val df = rows.toDF("g", "item", "m").repartition(7)
    val agged = df.groupBy(col("g"))
      .agg(topK(col("item"), col("m"), 5).as("top"))
    // the scale contract: a map-side PARTIAL heap runs before the
    // shuffle (ObjectHashAggregate partial_top_k), so the exchange
    // carries <= k entries per group per map partition
    val plan = agged.queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k"), s"no partial aggregation in:\n$plan")
    val viaAgg = agged
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col.item"), col("col.metric"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("m").desc, col("item").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
      .collect().map(r => (r.getString(0), r.getInt(3), r.getString(1), r.getLong(2))).toSet
    assert(viaAgg === viaWindow)
    // null metric and null item rows are skipped, not ranked
    val withNulls = Seq(("g", "a", Some(5L)), ("g", "b", None),
      ("g", null.asInstanceOf[String], Some(9L)), ("g", "c", Some(1L)))
      .toDF("g", "item", "m")
    val top = withNulls.groupBy(col("g"))
      .agg(topK(col("item"), col("m"), 3).as("top"))
      .select(explode(col("top")).as("e"))
      .collect().map(r => r.getStruct(0).getString(0))
    assert(top.toSeq === Seq("a", "c"))
  }

  test("token entropy: uniform, constant, mixed, empty") {
    val df = Seq(
      (1L, "a b c d"),  // uniform over 4 → ln 4
      (2L, "a a a a"),  // constant → 0
      (3L, "   "),      // no tokens → 0
      (4L, "a a b b"),  // ln 2
      (5L, "a a a b")   // ln 4 - (3 ln 3)/4
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextStats.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextStats.tokenEntropyOf(col("toks")).as("e"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-6
    assert(approx(df(1L), math.log(4)))
    assert(df(2L) === 0.0)
    assert(df(3L) === 0.0)
    assert(approx(df(4L), math.log(2)))
    assert(approx(df(5L), math.log(4) - 3 * math.log(3) / 4))
  }

  test("text stats: counts and ratios on a known sentence") {
    val df = Seq((1L, "The quick, brown fox! It is a fox.")).toDF("id", "text")
    val r = df.select(
      TextStats.nTokens($"text").as("nt"),
      TextStats.punctRatio($"text").as("pr"),
      TextStats.stopwordRatio($"text").as("sr"),
      TextStats.langId($"text").as("lang")).collect()(0)
    assert(r.getLong(0) === 8L)
    assert(r.getDouble(1) > 0 && r.getDouble(1) < 0.2)
    assert(r.getDouble(2) > 0.3) // the, it, is, a
    assert(r.getString(3) === "en")
  }

  test("native expressions are bit-identical to their declarative specs") {
    val df = docs.select(col("doc_id"),
      TextStats.tokens(col("text")).as("toks"))
    val cmp = df.select(
      MinHash.shingles(col("toks")).as("native_sh"),
      MinHash.shinglesDeclarative(col("toks")).as("decl_sh"),
      SimHash.simhash32(col("toks")).as("native_h"),
      SimHash.simhash32Declarative(col("toks")).as("decl_h")).collect()
    cmp.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getLong(2) === r.getLong(3))
    }
    val emb = Seq((Array(0.3f, -1.2f, 4f), Array(1f, 0.5f, -0.25f)))
      .toDF("a", "b")
    val c = emb.select(
      Similarity.cosine(col("a"), col("b")).as("n"),
      Similarity.cosineDeclarative(col("a"), col("b")).as("d")).collect()(0)
    assert(c.getDouble(0) === c.getDouble(1))
    // minhash native sigs == declarative per-perm minhash columns
    val sh = df.select(col("doc_id"), MinHash.shingles(col("toks")).as("sh"))
    val both = sh.select(col("doc_id"),
      graft.functions.HashExpressions.minhashSigs(col("sh"), 4).as("nat"),
      array((0 until 4).map(p => MinHash.minhash(col("sh"), p)): _*).as("dec"))
      .collect()
    both.foreach(r => assert(r.getSeq[String](1) === r.getSeq[String](2)))
  }

  test("RegexpCount: codegen and interpreted paths both match size(regexp_extract_all)") {
    import graft.functions.RegexpCount.regexpCount
    val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    val rows = Seq("", "   ", "abc", "a1b2!", "héllo wörld 42", "!!!???",
      "mixed 123 text, with.punct!", "\ttabs\nnewlines  ", "ab" * 500)
      .zipWithIndex.map(_.swap)
    def run(): Seq[(Long, Long)] = rows.toDF("id", "t")
      .select(
        regexpCount(col("t"), pat).as("native"),
        size(regexp_extract_all(col("t"), lit(pat), lit(0))).cast("long").as("builtin"))
      .as[(Long, Long)].collect().toSeq
    // CODEGEN_ONLY forces doGenCode (a fallback would throw instead of
    // silently switching to interpreted eval)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val codegen = run()
      assert(codegen.forall { case (n, b) => n == b }, codegen.toString)
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = run()
      assert(interpreted === codegen)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    // SQL surface
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT regexp_count('a,b,,c', ',')").collect()(0).getLong(0)
    assert(viaSql === 3L)
  }

  test("rolling fingerprint: order-sensitive, deterministic, bounded") {
    val df = Seq(
      ("a b c", "a b c"), ("a b c", "c b a"), ("a b c", "a b c d"))
      .toDF("x", "y").select(
        TextStats.rollingFingerprint(TextStats.tokens(col("x"))).as("fx"),
        TextStats.rollingFingerprint(TextStats.tokens(col("y"))).as("fy"))
      .collect()
    assert(df(0).getLong(0) === df(0).getLong(1))  // identical text
    assert(df(1).getLong(0) !== df(1).getLong(1))  // permuted ≠
    assert(df(2).getLong(0) !== df(2).getLong(1))  // appended ≠
    df.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < 2147483647L))
  }

  test("winnowing: guarantee, window coverage, short-doc domain") {
    val k = 3; val w = 4
    // docs 1 and 2 share an 8-token span (>= w+k-1 = 6): the winnowing
    // guarantee says they MUST share at least one selected fingerprint
    val shared = "the quick brown fox jumps over lazy dogs"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta"),
      (2L, s"one two three four $shared five six"),
      (3L, "totally unrelated content with many distinct tokens here now"),
      (4L, "too short"),            // < k tokens: no grams
      (5L, "five tokens but not enough")  // grams < w: no full window
    ).toDF("doc_id", "text")
    val fps = TextStats.winnowFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)   // the MOSS guarantee
    assert((byDoc(3L) intersect byDoc(1L)).isEmpty)
    assert(!byDoc.contains(4L) && !byDoc.contains(5L)) // outside the domain
    // coverage: every full window of doc 3 contains a selected position
    val sel3 = fps.filter(_._1 == 3L).map(_._2).toSet
    val nGrams3 = 10 - k + 1
    (1 to nGrams3 - w + 1).foreach { p =>
      assert((p until p + w).exists(j => sel3.contains(j.toLong)),
        s"window at $p selected nothing")
    }
    // determinism: identical text yields identical fingerprint sets
    val twin = Seq((7L, s"alpha beta $shared gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val fps7 = TextStats.winnowFingerprints(twin, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(fps7 === fps.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet)
    // a document past the position cap fails LOUDLY (silent aliasing of
    // packed (hash, pos) keys would corrupt selections)
    val huge = Seq((8L, Seq.fill((TextStats.WinnowPosCap + 4).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      TextStats.winnowFingerprints(huge, "doc_id", "text", k, w).count()
    }
    assert(ex.getMessage.contains("chunk it first") ||
      Option(ex.getCause).exists(_.getMessage.contains("chunk it first")))
  }

  test("frameSamplePlan: even stride, at most maxFrames, stills excluded") {
    val feats = Seq(
      (1L, "video", 10L, 320, 240, 20),  // stride 3 → 0,3,6,9,12,15,18 (7)
      (2L, "video", 10L, 320, 240, 3),   // stride 1 → all 3 frames
      (3L, "image", 10L, 64, 64, 1),     // still → excluded
      (4L, "audio", 10L, 1, 1, 100)      // stride 13 → 8 samples
    ).toDF("media_id", "media_type", "n_bytes", "width", "height", "n_frames")
    val plan = graft.llm.Multimodal.frameSamplePlan(feats, maxFrames = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    val byId = plan.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byId(1L) === Seq(0, 3, 6, 9, 12, 15, 18))
    assert(byId(2L) === Seq(0, 1, 2))
    assert(!byId.contains(3L))
    assert(byId(4L).length === 8 && byId(4L).head === 0 && byId(4L).forall(_ < 100))
  }

  test("resizePlan: aspect-fit into the box, no upscaling, non-images excluded") {
    val feats = Seq(
      (1L, "png", 100, 50, 1),    // fits → unchanged
      (2L, "jpeg", 448, 224, 1),  // wide: width binds → 224×112
      (3L, "gif", 100, 1000, 1),  // tall: height binds → 22×224
      (4L, "wav", 1920, 1080, 9)  // not an image format → excluded
    ).toDF("media_id", "format", "width", "height", "n_frames")
    val got = graft.llm.Multimodal.resizePlan(feats, 224, 224)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4)))
    assert(got.toSeq === Seq((1L, 100, 50), (2L, 224, 112), (3L, 22, 224)))
  }

  test("multimodal: real header parse per-partition, garbage yields nulls") {
    import graft.llm.MediaFixtures
    val media = Seq(
      (1L, "image", MediaFixtures.pngBytes(17, 23, 10)),
      (2L, "audio", MediaFixtures.wavBytes(2, 16000, 555)),
      (3L, "video", MediaFixtures.gifBytes(40, 30, 5)),
      (4L, "image", MediaFixtures.jpegBytes(640, 480)),
      (5L, "image", "not media at all".getBytes("UTF-8")),
      (6L, "video", Array.empty[Byte])
    ).toDF("media_id", "media_type", "payload")
    val out = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    // cols: media_id, media_type, n_bytes, format, width, height,
    //       n_frames, channels, sample_rate
    assert(out(0).getString(3) === "png" && out(0).getInt(4) === 17 &&
      out(0).getInt(5) === 23 && out(0).getInt(6) === 1)
    assert(out(1).getString(3) === "wav" && out(1).getInt(6) === 555 &&
      out(1).getInt(7) === 2 && out(1).getInt(8) === 16000)
    assert(out(2).getString(3) === "gif" && out(2).getInt(4) === 40 &&
      out(2).getInt(5) === 30 && out(2).getInt(6) === 5)
    assert(out(3).getString(3) === "jpeg" && out(3).getInt(4) === 640 &&
      out(3).getInt(5) === 480)
    assert(out(4).isNullAt(3) && out(4).isNullAt(4) && out(4).isNullAt(6))
    assert(out(5).isNullAt(3) && out(5).getLong(2) === 0L)
  }

  test("editDistancePairs: exact distances on candidates, prefix cap, min-sim gate") {
    val pairs = Seq((0L, 3L), (0L, 1L), (0L, 2L)).toDF("id_a", "id_b")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // exact duplicate: zero distance, similarity 1
    assert(out((0L, 3L)) === ((0L, 1.0)))
    // docA vs docA2 differ only in the final word: lev(today, tomorrow) = 6
    val lenA2 = docA2.length
    assert(out((0L, 1L)) === ((6L, math.rint((1.0 - 6.0 / lenA2) * 1e6) / 1e6)))
    // unrelated pair scores low but is still reported at minNormSim = 0
    assert(out((0L, 2L))._1 > 30L)
    // the gate drops it
    val gated = Dedup.editDistancePairs(docs, "doc_id", "text", pairs,
      minNormSim = 0.9).collect()
    assert(gated.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 3L), (0L, 1L)))
    // prefix cap: distances computed on the capped prefixes only
    val short = Dedup.editDistancePairs(docs, "doc_id", "text", pairs, prefixLen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(short((0L, 1L)) === 0L) // identical first 10 chars
  }

  test("semanticDedupSurvivors: min-id survivor per within-cluster component") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.05f, 0.0f, 0.0f)),  // near-dup of 0
      (2L, Array(0.98f, -0.05f, 0.0f, 0.0f)), // near-dup of 0 and 1 (chain)
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.02f, 0.99f, 0.0f, 0.0f)),  // near-dup of 3
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f))     // singleton cluster
    ).toDF("vec_id", "embedding")
    val cents = Array(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f))
    val surv = Dedup.semanticDedupSurvivors(vecs, "vec_id", "embedding",
        cents, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(surv === Set(0L, 3L, 5L))
    // a threshold no pair reaches keeps the whole corpus (empty pair graph)
    val all = Dedup.semanticDedupSurvivors(vecs, "vec_id", "embedding",
        cents, threshold = 0.999999)
      .select("vec_id").as[Long].collect().toSet
    assert(all === Set(0L, 1L, 2L, 3L, 4L, 5L))
  }
}
