package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Jaccard, MinHash, SetSim, TextStats}

/** Set-similarity joins: the prefix filter is proven EXACT against a
  * brute-force all-pairs scan (the whole point of the operator — prune
  * without loss), and the sorted-neighborhood pass is proven sound
  * (every emitted pair is a true pair) with its recall measured, not
  * assumed.
  */
class SetSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Brute-force ground truth: every doc pair with shingle-set Jaccard
    * ≥ threshold (test-only — O(n²) on the 500-doc fixture).
    */
  private def brute(threshold: Double): Set[(Long, Long)] = {
    val sets = docs.select(col("doc_id"),
        MinHash.shingles(TextStats.tokens(col("text"))).as("toks"))
      .where(size(col("toks")) > 0)
    val a = sets.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
    a.join(b, col("id_a") < col("id_b"))
      .where(Jaccard.jaccardDistinct(col("toks_a"), col("toks_b")) >= threshold)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("prefix filter finds EXACTLY the brute-force pair set") {
    val want = brute(0.6)
    val got = SetSim.prefixFilterPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "fixture has no qualifying pairs — test is vacuous")
    assert(got === want)
  }

  test("prefix filter at a higher threshold is a subset of a lower one") {
    val lo = SetSim.prefixFilterPairs(docs, "doc_id", "text", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hi = SetSim.prefixFilterPairs(docs, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hi.subsetOf(lo))
  }

  test("sorted-neighborhood is sound (no false pairs) and its recall is measured") {
    val truth = brute(0.4)
    val got = SetSim.sortedNeighborhoodPairs(docs, "doc_id", "text",
        "lang", col("n_chars"), window = 10, threshold = 0.4)
      .collect()
    got.foreach { r =>
      // SNM orders a pair by POSITION in the sorted block, not by id —
      // normalize to (min, max) to compare against the brute-force set
      val (x, y) = (r.getLong(1), r.getLong(2))
      val pair = (math.min(x, y), math.max(x, y))
      assert(truth.contains(pair), s"false positive $pair")
      val gap = r.getLong(3)
      assert(gap >= 1 && gap <= 10, s"pair outside window: gap=$gap")
    }
    // the length sort key collates near-identical docs; on this fixture
    // it must recover a nontrivial share of the true pairs (measured,
    // so a silent ordering regression fails loudly)
    val recall = got.size.toDouble / truth.size
    assert(recall > 0.1, s"recall $recall collapsed (${got.size}/${truth.size})")
  }

  test("window=1 compares only adjacent rows; pairs never cross blocks") {
    val r = SetSim.sortedNeighborhoodPairs(docs, "doc_id", "text",
        "lang", col("n_chars"), window = 1, threshold = 0.4)
      .collect()
    assert(r.forall(_.getLong(3) == 1L))
    // block column is the lang of BOTH sides by construction of the join
    val langOf = docs.select(col("doc_id"), col("lang"))
      .collect().map(r2 => r2.getLong(0) -> r2.getString(1)).toMap
    r.foreach { row =>
      assert(langOf(row.getLong(1)) === row.getString(0))
      assert(langOf(row.getLong(2)) === row.getString(0))
    }
  }
}
