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

  /** Host of a raw URL — lowercased, port stripped, `www.` PRESERVED
    * (domain rules must see the real host; suffix matching below makes
    * `www.` irrelevant anyway).
    */
  def hostOf(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(regexp_replace(url, "#.*$", ""),
        "^[^:/?#]+://([^/?#]*)", 1)),
      ":[0-9]+$", "")

  /** Domain-blocklist filter — drop documents whose host IS a blocked
    * domain or is any SUBDOMAIN of one (`ads.example.com` falls to a
    * blocked `example.com`). Suffix semantics are implemented the
    * scalable way: explode each host into its dot-suffix chain
    * (`a.b.com` → `a.b.com`, `b.com`, `com`) and broadcast-SEMI-join
    * the suffixes against the blocklist on EQUALITY — never a
    * `LIKE '%.d'` non-equi join, which would plan as a nested loop. A
    * host of `s` labels explodes to `s+1` rows, a constant factor; the
    * blocklist (even a few million domains) broadcasts. Returns the
    * surviving rows with their `host` attached.
    *
    * `blocked` is a one-column (`domain`) frame of lowercase apex or
    * subdomain entries — a frame, not a literal, because production
    * blocklists are datasets (URIBL dumps, policy tables), not code.
    */
  def domainFilter(df: DataFrame, idCol: String, urlCol: String,
                   blocked: DataFrame): DataFrame = {
    val withHost = df.withColumn("host", hostOf(col(urlCol)))
    val parts = split(col("host"), "\\.")
    val suffixes = transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
    val hits = withHost
      .select(col(idCol), explode(suffixes).as("domain"))
      .join(broadcast(blocked), Seq("domain"), "left_semi")
      .select(col(idCol)).distinct()
    withHost.join(hits, Seq(idCol), "left_anti")
  }
}
