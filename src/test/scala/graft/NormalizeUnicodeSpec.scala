package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NormalizeUnicode.normalizeUnicode

/** Native Unicode normalization: composed/decomposed encodings collapse
  * under NFC, compatibility characters fold only under NFKC, nulls pass
  * through, and the SQL registration matches the Column API.
  */
class NormalizeUnicodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val composed = "caf\u00e9"    // e-acute as one code point
  private val decomposed = "cafe\u0301" // e + combining acute accent
  private val ligature = "\ufb01le"     // fi ligature + "le"

  test("NFC collapses composed and decomposed encodings to one fingerprint") {
    val df = Seq(composed, decomposed).toDF("s")
      .select(normalizeUnicode(col("s"), "NFC").as("n"))
    val out = df.as[String].collect().toSet
    assert(out === Set(composed)) // both normalize to the composed form
    val fps = df.select(md5(col("n"))).as[String].collect().toSet
    assert(fps.size === 1)
  }

  test("NFKC folds compatibility characters; NFC leaves them alone") {
    val df = Seq(ligature).toDF("s")
    assert(df.select(normalizeUnicode(col("s"), "NFKC")).as[String].head()
      === "file")
    assert(df.select(normalizeUnicode(col("s"), "NFC")).as[String].head()
      === ligature)
  }

  test("nulls pass through; ASCII takes the already-normalized fast path") {
    val df = Seq(Some("plain ascii"), None).toDF("s")
      .select(normalizeUnicode(col("s"), "NFC").as("n"))
    val rows = df.collect().map(r => Option(r.getString(0)))
    assert(rows.toSeq === Seq(Some("plain ascii"), None))
  }

  test("SQL registration matches the Column API; bad form fails analysis") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      s"SELECT normalize_unicode('$decomposed', 'NFC') AS n")
      .as[String].head()
    assert(viaSql === composed)
    val e = intercept[Exception] {
      Seq("x").toDF("s")
        .select(normalizeUnicode(col("s"), "NFX")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("nfc/nfd/nfkc/nfkd") ||
      e.getMessage.contains("NFX"))
  }
}
