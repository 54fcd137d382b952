package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Dsir

/** DSIR importance resampling: hashed-n-gram featurization, the
  * smoothed bucket models (full spine, zero-count buckets present),
  * the BIGINT-exact weight sums, and the Gumbel-top-k sampler's
  * determinism and ∝-weight behavior.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hashedNgramCounts: unigrams + bigrams, bucket in range, counts sum to 2n-1") {
    val docs = Seq((1L, "a b c"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val f = Dsir.hashedNgramCounts(docs, "doc_id", "text", dims = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 3 unigrams + 2 bigrams = 5 features; doc 2: 1; doc 3: none
    assert(f.filter(_._1 == 1L).map(_._3).sum === 5L)
    assert(f.filter(_._1 == 2L).map(_._3).sum === 1L)
    assert(!f.exists(_._1 == 3L))
    assert(f.forall(t => t._2 >= 0 && t._2 < 16))
  }

  test("hashedNgramCounts: bigram feature differs from its unigrams (space-joined before hashing)") {
    // "b b" must hash the bigram "b b", not "b" twice: one doc of two
    // identical tokens yields a unigram bucket with cnt 2 AND a bigram
    // bucket with cnt 1. (Tokens chosen to dodge a real md5 prefix
    // coincidence: "a" and "a a" both land in bucket 441 mod 1024;
    // "b" -> 1022, "b b" -> 332.)
    val docs = Seq((1L, "b b")).toDF("doc_id", "text")
    val f = Dsir.hashedNgramCounts(docs, "doc_id", "text", dims = 1024)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(f.values.sum === 3L)
    assert(f.size === 2) // unigram bucket (cnt 2) + bigram bucket (cnt 1)
  }

  test("bucketModel: full spine, add-one smoothing, probabilities normalize") {
    val feats = Seq((1L, 3L, 4L), (2L, 3L, 1L), (3L, 7L, 5L))
      .toDF("doc_id", "bucket", "cnt")
    val m = Dsir.bucketModel(feats, dims = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m.size === 8) // every bucket present, zero-count included
    // total=10: bucket 3 -> ln(6/18), bucket 7 -> ln(6/18), others ln(1/18)
    assert(m(3) === math.round(math.log(6.0 / 18.0) * 1e9))
    assert(m(7) === math.round(math.log(6.0 / 18.0) * 1e9))
    assert(m(0) === math.round(math.log(1.0 / 18.0) * 1e9))
    // smoothed distribution sums to 1 (up to nano rounding)
    val p = m.values.map(lp => math.exp(lp / 1e9)).sum
    assert(math.abs(p - 1.0) < 1e-6)
  }

  test("importanceWeights: exact BIGINT sum of cnt * dlp over buckets") {
    val feats = Seq((1L, 0L, 2L), (1L, 1L, 3L), (2L, 1L, 1L))
      .toDF("doc_id", "bucket", "cnt")
    val tm = Seq((0L, 100L), (1L, -50L)).toDF("bucket", "lp_nano")
    val rm = Seq((0L, 40L), (1L, -80L)).toDF("bucket", "lp_nano")
    val w = Dsir.importanceWeights(feats, "doc_id", tm, rm)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // dlp: b0 = 60, b1 = 30; doc1 = 2*60 + 3*30 = 210; doc2 = 30
    assert(w(1L) === ((5L, 210L)))
    assert(w(2L) === ((1L, 30L)))
  }

  test("gumbelTopK: deterministic across runs, rank 1 = max key, ids break ties") {
    val w = (0L until 50L).map(i => (i, 10L, i * 1000000L))
      .toDF("doc_id", "n_feats", "logw_nano")
    val a = Dsir.gumbelTopK(w, "doc_id", 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val b = Dsir.gumbelTopK(w.repartition(7), "doc_id", 10).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq) // partitioning-invariant
    assert(a.map(_._1).toSeq === (1 to 10))
    assert(a.map(_._3).toSeq === a.map(_._3).sortBy(-_).toSeq) // keys desc
  }

  test("gumbelTopK: overwhelming weight is always selected (∝ w sampling)") {
    // one doc with a log-weight 1e6 nats above the rest dominates any
    // Gumbel noise (|gumbel| ~ tens of nats)
    val w = ((0L until 20L).map(i => (i, 1L, 0L)) :+ ((99L, 1L, 1000000000000000L)))
      .toDF("doc_id", "n_feats", "logw_nano")
    val top = Dsir.gumbelTopK(w, "doc_id", 1).collect()
    assert(top.head.getLong(1) === 99L)
  }
}
