package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and registered-domain rollups — the curation
  * ops a web-scale corpus pipeline runs before any dedup pass: the same
  * page arrives as `HTTP://WWW.Site.com:80/a/?utm_source=feed&id=7#top`
  * and `http://site.com/a?id=7`, and a fingerprint-grain dedup that
  * hasn't canonicalized treats them as distinct documents. (The
  * reference pipeline has no URL surface — `dags/pdq_etl_dag.py` keys
  * everything on lease/operator numbers — so this family is part of the
  * training-data extension scope, not §2.)
  *
  * Everything is a pure column expression (regexp + array ops, no UDF,
  * fully codegen'd), so canonicalization runs map-side at scan speed
  * and the DuckDB twin can re-derive byte-identical output.
  *
  * Canonical form (a pragmatic subset of RFC 3986 §6 normalization +
  * the tracking-param strip every crawler applies):
  *   - scheme and host lowercased; userinfo dropped
  *   - default ports stripped (`:80` for http, `:443` for https)
  *   - fragment dropped
  *   - tracking params removed (`utm_*`, `gclid`, `fbclid`, `ref`)
  *   - surviving query params sorted (param order is not semantic)
  *   - trailing path slashes stripped; empty path → `/`
  */
object Urls {

  private val TrackingParam = "^(utm_[a-z0-9_]*=|utm_[a-z0-9_]*$|gclid=|fbclid=|ref=)"

  /** Lowercased host (no userinfo, no port) of a URL. */
  def host(url: Column): Column =
    lower(regexp_replace(
      regexp_extract(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      "(^[^@]*@|:[0-9]*$)", ""))

  /** The canonical URL string (see object doc for the normal form). */
  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawPort = regexp_extract(
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
      ":([0-9]+)$", 1)
    val port = when(
      (scheme === "http" && rawPort === "80") ||
        (scheme === "https" && rawPort === "443") || rawPort === "", lit(""))
      .otherwise(concat(lit(":"), rawPort))
    val rawPath = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQuery = regexp_extract(u, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(TrackingParam)))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host(url), port, path, query)
  }

  /** Multi-label public suffixes the two-label heuristic would split
    * wrong. A real deployment broadcasts the full Mozilla public-suffix
    * list as a lookup frame; the op's shape (label slicing against a
    * suffix set) is identical.
    */
  val MultiSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "co.in", "co.kr", "com.cn",
    "com.mx", "co.za", "com.sg", "com.tr")

  /** eTLD+1 (the "registered domain"): the grain crawl frontier caps,
    * per-site quality priors, and robots policies key on. `site.co.uk`
    * stays `site.co.uk` (not `co.uk`); `a.b.site.com` → `site.com`.
    */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val parts = split(h, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    when(size(parts) >= 3 && last2.isin(MultiSuffixes: _*),
      concat_ws(".", element_at(parts, -3), element_at(parts, -2),
        element_at(parts, -1)))
      .when(size(parts) >= 2, last2)
      .otherwise(h)
  }

  /** Per-registered-domain crawl-health rollup: raw URL count, distinct
    * canonical URLs, distinct hosts, and the share of raw URLs that
    * canonicalization revealed as duplicates — the column a frontier
    * dedup thresholds on before fetching.
    *
    * Scale shape: one keyed aggregate at domain grain (the canonical
    * form and domain are map-side expressions); the two distincts nest
    * in the same shuffle via partial aggregation.
    */
  def domainStats(df: DataFrame, urlCol: String): DataFrame =
    df.select(registeredDomain(col(urlCol)).as("domain"),
        canonicalizeUrl(col(urlCol)).as("__canon"),
        host(col(urlCol)).as("__host"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("__canon")).as("n_canonical"),
        count_distinct(col("__host")).as("n_hosts"),
        round(lit(1.0) - count_distinct(col("__canon")).cast("double") /
          count(lit(1)).cast("double"), 6).as("dup_ratio"))
}
