package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MinHash, TextStats}

/** Cross-check our md5-based MinHash LSH against Spark ML's built-in
  * `MinHashLSH` (SURVEY.md §7.3 names it as the built-in alternative):
  * both must surface the planted near-duplicate pair and agree that the
  * unrelated document pairs with nothing.
  */
class MlCrossCheckSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("spark.ml MinHashLSH agrees with graft MinHash on planted near-dups") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
      (2L, "completely different content about spark shuffles and partitions at scale"))
      .toDF("doc_id", "text")

    // graft path
    val ours = MinHash.dupPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

    // spark.ml path: shingle set → sparse term vector → MinHashLSH
    val shingled = docs.select(col("doc_id"),
      MinHash.shingles(TextStats.tokens(col("text"))).as("sh"))
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18)
    val feat = tf.transform(shingled)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(feat)
    val ml = model.approxSimilarityJoin(feat, feat, 0.5, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .where(col("a") < col("b"))
      .as[(Long, Long)].collect().toSet

    assert(ours.contains((0L, 1L)) && ml.contains((0L, 1L)))
    assert(!ours.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!ml.exists(p => p._1 == 2L || p._2 == 2L))
  }
}
