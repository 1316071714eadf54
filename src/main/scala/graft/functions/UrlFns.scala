package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-crawl pipelines (cf. the reference's link
  * handling, `scraper/div_link_handler.py:45-567`, which navigates raw
  * hrefs — at corpus scale the same links must be NORMALIZED before URL-level
  * dedup or per-domain capping, or every tracking-param variant counts as a
  * distinct page).
  *
  * Canonical form: fragment stripped; scheme/host/port lowercased; default
  * ports (https:443, http:80) dropped; tracking query params (utm_*, gclid,
  * fbclid) removed; remaining params sorted; a now-empty query string drops
  * its '?'. Pure regexp/array built-ins — codegen'd, no UDF — with a DuckDB
  * mirror of each step for the oracle.
  *
  * Scale: a narrow per-row projection (no shuffle, no join); the follow-on
  * per-domain aggregation is one hash agg with map-side combine.
  */
object UrlFns {

  private val Tracking = "^(utm_|gclid|fbclid)"

  /** Canonicalized URL (see object doc for the exact steps). */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val auth = lower(regexp_extract(noFrag, "^([^:/?#]+://[^/?#]*)", 1))
    val rest = regexp_replace(noFrag, "^[^:/?#]+://[^/?#]*", "")
    val authNoPort = regexp_replace(
      regexp_replace(auth, "^(https://[^/:]+):443$", "$1"),
      "^(http://[^/:]+):80$", "$1")
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val q = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(q, "&"),
      p => !(p.rlike(Tracking) || p === lit("")))
    concat(authNoPort, path,
      when(size(params) > 0, concat(lit("?"), array_join(array_sort(params), "&")))
        .otherwise(lit("")))
  }

  /** DuckDB mirror of `normalizeUrl` over a column/expression `u`. */
  def normalizeUrlSql(u: String): String = {
    val noFrag = s"regexp_replace($u, '#.*$$', '')"
    val auth = s"lower(regexp_extract($noFrag, '^([^:/?#]+://[^/?#]*)', 1))"
    val rest = s"regexp_replace($noFrag, '^[^:/?#]+://[^/?#]*', '')"
    val authNoPort = "regexp_replace(regexp_replace(" + auth +
      """, '^(https://[^/:]+):443$', '\1'), '^(http://[^/:]+):80$', '\1')"""
    val path = s"regexp_extract($rest, '^([^?]*)', 1)"
    val q = s"regexp_extract($rest, '\\?(.*)$$', 1)"
    val params = s"list_filter(string_split($q, '&'), " +
      s"p -> NOT regexp_matches(p, '$Tracking') AND p <> '')"
    s"($authNoPort || $path || CASE WHEN len($params) > 0 " +
      s"THEN '?' || array_to_string(list_sort($params), '&') ELSE '' END)"
  }

  /** Registrable domain-ish key of a canonical URL: host minus a leading
    * `www.` (a true public-suffix split needs the suffix list; this is the
    * standard approximation when it isn't shipped).
    */
  def domain(canonical: Column): Column =
    regexp_extract(canonical, "^[a-z]+://(?:www\\.)?([^/:?#]+)", 1)

  def domainSql(canonical: String): String =
    s"regexp_extract($canonical, '^[a-z]+://(?:www\\.)?([^/:?#]+)', 1)"
}
