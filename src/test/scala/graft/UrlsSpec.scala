package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Urls

/** URL canonicalization: each normalization rule individually, the
  * registered-domain label slice, and the domain rollup's dup math.
  */
class UrlsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Urls.canonicalizeUrl(col("u"))).head().getString(0)

  test("canonicalize: case, default port, fragment, tracking, sort, slash") {
    assert(canon("HTTP://WWW.Site.COM:80/A/b/?utm_source=x&id=7&a=1#frag")
      === "http://www.site.com/A/b?a=1&id=7")
    // https default port stripped; non-default kept
    assert(canon("HTTPS://site.com:443/x") === "https://site.com/x")
    assert(canon("https://site.com:8443/x") === "https://site.com:8443/x")
    // http:443 is NOT default — kept
    assert(canon("http://site.com:443/x") === "http://site.com:443/x")
    // empty path → /; userinfo dropped; query with only tracking → dropped
    assert(canon("http://user:pw@Site.com?utm_campaign=z&gclid=abc")
      === "http://site.com/")
    // path case preserved (paths are case-sensitive per RFC); params sorted
    assert(canon("http://a.com/P?b=2&a=1&fbclid=x&ref=hp") === "http://a.com/P?a=1&b=2")
  }

  test("registeredDomain: eTLD+1 with multi-label public suffixes") {
    val got = Seq(
      "http://a.b.site.com/x", "http://site.com/x", "http://www.site.co.uk/x",
      "http://site.co.uk/x", "https://deep.sub.example.com.au/",
      "http://localhost/x")
      .toDF("u").select(Urls.registeredDomain(col("u"))).as[String].collect()
    assert(got.toSeq === Seq("site.com", "site.com", "site.co.uk",
      "site.co.uk", "example.com.au", "localhost"))
  }

  test("domainStats: canonicalization unifies dupes; distinct hosts counted") {
    val df = Seq(
      "http://A.com/x?utm_source=1", "http://a.com:80/x/", "http://a.com/x",
      "http://www.a.com/y",
      "https://b.co.uk/z", "https://B.CO.UK/z#f").toDF("url")
    val rows = Urls.domainStats(df, "url").orderBy("domain").collect()
    assert(rows.length === 2)
    val a = rows(0)
    assert(a.getString(0) === "a.com")
    assert(a.getLong(1) === 4L)   // raw urls
    assert(a.getLong(2) === 2L)   // canonical: a.com/x, www.a.com/y
    assert(a.getLong(3) === 2L)   // hosts: a.com, www.a.com
    assert(a.getDouble(4) === 0.5)
    val b = rows(1)
    assert(b.getString(0) === "b.co.uk")
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((2L, 1L, 1L)))
  }
}
