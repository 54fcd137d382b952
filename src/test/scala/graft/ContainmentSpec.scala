package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Containment

/** Overlap-coefficient (containment) pairs: a short doc pasted into a
  * long host scores ~1.0 where Jaccard stays low; the frequency cap
  * drops boilerplate shingles from the numerator only.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // quote: 8 words → 6 distinct trigrams, all unique in the corpus
  private val quote = "alpha beta gamma delta epsilon zeta eta theta"
  private val host = quote + " plus lots of extra framing words around the quoted passage here"
  private val other = "unrelated text about completely different things entirely elsewhere now"
  private val docs = Seq((0L, quote), (1L, host), (2L, other))
    .toDF("doc_id", "text")

  test("full containment of the quote in the host scores 1.0") {
    val rows = Containment.overlapPairs(docs, "doc_id", "text").collect()
    assert(rows.length === 1)
    val r = rows(0)
    assert((r.getLong(0), r.getLong(1)) === ((0L, 1L)))
    assert(r.getLong(2) === 6L)            // n_shared = all 6 quote trigrams
    assert(r.getLong(3) === 6L)            // n_a = quote's trigram set
    assert(r.getLong(4) === 17L)           // n_b = host's 19-token → 17 trigrams
    assert(r.getDouble(5) === 1.0)         // 6 / min(6, 17)
    // symmetric Jaccard on the same pair is far below the 0.5 gate
    assert(6.0 / (6 + 17 - 6) < 0.5)
  }

  test("minOverlap gates; unrelated docs never pair") {
    val none = Containment.overlapPairs(docs, "doc_id", "text",
      minOverlap = 1.01)
    assert(none.count() === 0)
    val all = Containment.overlapPairs(docs, "doc_id", "text",
      minOverlap = 0.0)
    assert(!all.select("id_a", "id_b").collect()
      .exists(r => r.getLong(0) == 2L || r.getLong(1) == 2L))
  }

  test("frequency cap drops boilerplate shingles from the numerator only") {
    // "common header line" appears in all 3 docs (boilerplate, df=3);
    // docs 0 and 1 additionally share 3 private trigrams (df=2)
    val d = Seq(
      (0L, "common header line private shared tail zero"),
      (1L, "common header line private shared tail one"),
      (2L, "common header line other words here two")).toDF("doc_id", "text")
    val r = Containment.overlapPairs(d, "doc_id", "text",
      minOverlap = 0.0, maxDocsPerShingle = 2)
      .where(col("id_a") === 0L && col("id_b") === 1L).collect()
    assert(r.length === 1)
    assert(r(0).getLong(2) === 3L)          // boilerplate trigram dropped
    // sizes stay TRUE set sizes (7 tokens → 5 trigrams)
    assert(r(0).getLong(3) === 5L && r(0).getLong(4) === 5L)
    assert(r(0).getDouble(5) === 0.6)
    val un = Containment.overlapPairs(d, "doc_id", "text",
      minOverlap = 0.0, maxDocsPerShingle = 1000)
    // uncapped: the boilerplate trigram counts again on (0,1)...
    val r01 = un.where(col("id_a") === 0L && col("id_b") === 1L).collect()
    assert(r01(0).getLong(2) === 4L && r01(0).getDouble(5) === 0.8)
    // ...and the boilerplate-only pairs (0,2)/(1,2) appear at all
    assert(un.count() === 3L)
  }
}
