package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Similarity

/** Simplified silhouette: planted well-separated clusters score near 1
  * with their own centroids; deliberately wrong centroids score lower,
  * and accounting invariants hold.
  */
class SilhouetteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two orthogonal-ish clusters in 4-d
  private val vecs = Seq(
    (0L, Array(1.0f, 0.05f, 0f, 0f)), (1L, Array(0.95f, 0f, 0.05f, 0f)),
    (2L, Array(1.0f, 0f, 0f, 0.05f)),
    (3L, Array(0f, 0.05f, 1.0f, 0f)), (4L, Array(0.05f, 0f, 0.95f, 0f)),
    (5L, Array(0f, 0f, 1.0f, 0.05f)))

  test("planted clusters score high with true centroids, lower with bad ones") {
    val df = vecs.toDF("vec_id", "embedding")
    val good = Array(Array(1f, 0f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val gotGood = Similarity
      .silhouetteSimplified(df, "vec_id", "embedding", good)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(gotGood.keySet === Set(0, 1))
    assert(gotGood.values.map(_._1).sum === 6L) // every vector scored once
    gotGood.values.foreach { case (_, avg) => assert(avg > 0.9) }
    // one centroid inside each cluster's span + one between them:
    // the boundary centroid steals nothing but compresses margins
    val bad = Array(Array(1f, 0f, 0f, 0f),
      Array(0.7f, 0f, 0.7f, 0f))
    val gotBad = Similarity
      .silhouetteSimplified(df, "vec_id", "embedding", bad)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(gotBad.values.forall(_ < gotGood.values.map(_._2).min))
  }
}
