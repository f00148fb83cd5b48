package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — step zero of a crawl
  * pipeline: the same page is fetched as `http://Example.com/a/?b=2&a=1`,
  * `example.com:80/a?a=1&b=2#top`, and a `?utm_source=` variant, and
  * URL-level dedup (cheapest of all dedups — no content needed) only
  * works after those collapse to one key.
  *
  * Canonical form (for absolute http/https URLs):
  *  - scheme and host lowercase; a leading `www.` dropped;
  *  - default ports stripped (`:80` for http, `:443` for https);
  *  - the fragment dropped (never sent to the server);
  *  - tracking parameters dropped (`utm_*`, `gclid`, `fbclid`,
  *    `msclkid`, `mc_eid`, `ref`) — they vary per click, not per page;
  *  - remaining query params sorted (full `k=v` strings — one total
  *    order, engine-portable);
  *  - trailing slashes trimmed from the path (root stays `/`; an empty
  *    path becomes `/`). Path/query CASE IS PRESERVED — paths are
  *    case-sensitive on most servers, so lowercasing them would merge
  *    distinct pages.
  *
  * Scale shape: one codegen-friendly expression chain (regexps + array
  * HOFs) — map-only, no shuffle, a free rider on any scan; the dedup on
  * the canonical key is the standard hash-aggregate. Non-http(s) input
  * canonicalizes best-effort (the regexps extract empty components) —
  * callers filter scheme first if the corpus mixes protocols.
  */
object Urls {

  private val TrackingParam = "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)="

  /** Canonical form of an absolute http/https URL (see object doc). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([^:/?#]+)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]*)", 1))
    val noWww = regexp_replace(hostRaw, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val pathRaw = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val trimmed = regexp_replace(pathRaw, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !lower(p).rlike(TrackingParam)))
    concat(scheme, lit("://"), host, path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** URL-level dedup: one survivor (min `idCol`) per canonical URL,
    * plus the duplicate count — [[graft.dedup.Dedup.dedupExact]] keyed
    * on [[canonicalizeUrl]].
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    graft.dedup.Dedup.dedupExact(
      df.withColumn("url_canon", canonicalizeUrl(col(urlCol))),
      "url_canon", idCol)
}
