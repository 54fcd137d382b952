package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GraphSim, Hits}

/** HITS fixed-point parity with an in-memory integer replica, and
  * neighbor-Jaccard parity with a brute-force set computation
  * (including the degree-cap contract).
  */
class GraphSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two hubs (0, 1) covering authorities 10..13; node 2 a narrow buyer
  private val edgeList = Seq(
    (0L, 10L), (0L, 11L), (0L, 12L), (0L, 13L),
    (1L, 10L), (1L, 11L), (1L, 12L),
    (2L, 10L))

  /** Exact replica of the distributed integer scheme. */
  private def denseHits(edges: Seq[(Long, Long)], iters: Int,
                        unit: Long): Map[Long, (Long, Long)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    var h = nodes.map(_ -> unit / n).toMap
    var a = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      val araw = edges.groupBy(_._2).view
        .mapValues(_.map(e => h(e._1)).sum).toMap
      val aTot = araw.values.sum
      a = nodes.map(v => v -> araw.getOrElse(v, 0L) * unit / aTot).toMap
      val hraw = edges.groupBy(_._1).view
        .mapValues(_.map(e => a(e._2)).sum).toMap
      val hTot = hraw.values.sum
      h = nodes.map(v => v -> hraw.getOrElse(v, 0L) * unit / hTot).toMap
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  test("HITS fixed-point is bit-equal to the in-memory integer replica") {
    val got = Hits.scoresFixedPoint(edgeList.toDF("s", "d"), "s", "d",
        iters = 3, unit = 1000000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = denseHits(edgeList, 3, 1000000000L)
    assert(got === want)
    // node 0 covers every authority → top hub; 10 is cited by all → top authority
    assert(got(0L)._1 === got.values.map(_._1).max)
    assert(got(10L)._2 === got.values.map(_._2).max)
    // pure authorities have zero hub mass, pure hubs zero authority mass
    assert(got(10L)._1 === 0L && got(0L)._2 === 0L)
  }

  test("neighbor Jaccard matches brute-force sets and honors the degree cap") {
    // 10 is shared by ALL of 0,1,2 — capped out at maxDegree=2
    val nbrs: Map[Long, Set[Long]] = edgeList.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val capped = edgeList.groupBy(_._2).filter(_._2.size > 2).keySet // {10}
    val want = (for {
      a <- nbrs.keys; b <- nbrs.keys if a < b
      ia = (nbrs(a) -- capped).intersect(nbrs(b) -- capped)
      if ia.size >= 2
      un = ((nbrs(a) -- capped) ++ (nbrs(b) -- capped)).size
    } yield (a, b, ia.size.toLong, un.toLong,
        ia.size.toLong * 1000000L / un)).toSet
    val got = GraphSim.neighborJaccard(edgeList.toDF("s", "d"), "s", "d",
        maxDegree = 2, minInter = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === want)
    // only (0,1) survives: {11,12,13} ∩ {11,12} = 2, union 3
    assert(got === Set((0L, 1L, 2L, 3L, 666666L)))
  }

  test("label propagation: two cliques with one bridge split into two communities") {
    // clique A = {1,2,3}, clique B = {10,11,12}, bridge 3—10
    val cliqueEdges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (3L, 10L))
    val got = graft.ops.Communities
      .labelPropagation(cliqueEdges.toDF("s", "d"), "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 10L, 11L, 12L))
    // each clique agrees internally; the two communities differ
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(10L), got(11L), got(12L)).size === 1)
    assert(got(1L) !== got(10L))
  }

  test("personalized PageRank: mass stays near seeds, unreachable nodes get zero") {
    // seed 0 feeds a chain 0→1→2; node 9 points INTO the seed region
    // but is unreachable FROM it → rank 0 under seeded teleport
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (9L, 1L)).toDF("s", "d")
    val seeds = Seq(0L).toDF("id")
    val got = graft.ops.PageRank
      .ranksPersonalizedFixedPoint(e, "s", "d", seeds, "id", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(9L) === 0L)
    assert(got(0L) === got.values.max) // the seed keeps the most mass
    assert(got(1L) > got(2L)) // closer to the seed → more mass
    // conservation: total ≤ unit (floors only leak downward)
    assert(got.values.sum <= 1000000000000L)
    // exact replica of one round by hand: r0 = unit at seed; contribs
    // r'(1) = 0.85 * (unit/1 from node 0) floored
    val oneRound = graft.ops.PageRank
      .ranksPersonalizedFixedPoint(e, "s", "d", seeds, "id", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneRound(1L) === 85L * 1000000000000L / 100L)
  }

  test("personalized PageRank: zero-seed edge degrades to zero rows; SQL twin guarded") {
    val e = Seq((0L, 1L), (1L, 2L)).toDF("s", "d")
    val noSeeds = Seq(42L).toDF("id") // not in the graph
    val out = graft.ops.PageRank
      .ranksPersonalizedFixedPoint(e, "s", "d", noSeeds, "id", iters = 2)
    assert(out.columns.toSeq === Seq("id", "rank_fp"))
    assert(out.count() === 0L)
    // the ANSI twin must degrade identically: its final select carries
    // the ns > 0 guard so a seedless graph yields zero rows, not x // 0
    val sql = graft.ops.PageRank.personalizedFixedPointSql(
      "SELECT 0 AS src, 1 AS dst", "SELECT 42 AS id", iters = 2)
    assert(sql.contains("WHERE (SELECT ns FROM scnt) > 0"))
  }

  test("BFS depths: shortest hop counts, budget bound, isolated seeds kept") {
    // path 1→2→3→4→5, plus a shortcut 1→4 (so 4 is depth 1, 5 depth 2)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("s", "d")
    val seeds = Seq(1L, 99L).toDF("id") // 99 has no edges at all
    val got = graft.ops.Bfs.depths(e, "s", "d", seeds, "id", maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 99L -> 0L, 2L -> 1L, 4L -> 1L,
      3L -> 2L, 5L -> 2L))
    // depth budget 1 stops the frontier
    val d1 = graft.ops.Bfs.depths(e, "s", "d", seeds, "id", maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 === Map(1L -> 0L, 99L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("feature hashing: signed sums account for every token, buckets bounded") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "alpha"), (3L, ""))
      .toDF("doc_id", "text")
    val got = graft.llm.FeatureHash.hashedFeatures(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (_, b, _) => b >= 0 && b < 8 })
    // |value| per (doc,bucket) ≤ token occurrences; doc 3 has no rows
    assert(!got.exists(_._1 == 3L))
    // same token → same bucket: doc 2's single bucket appears in doc 1
    val d2 = got.filter(_._1 == 2L)
    assert(d2.length === 1 && math.abs(d2.head._3) === 1L)
    val d1 = got.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(d1.contains(d2.head._2))
    // alpha counts twice the sign beta counts once; total |mass| = 3
    assert(d1.values.map(math.abs).sum === 3L)
  }
}
